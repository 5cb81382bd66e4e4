// QMM host bridge: the native transport between a plant (simulator or real
// vehicle) and the TPU-side MPPI solver server.
//
// This is the TPU build's replacement for the reference's ROS-topic graph
// (reference: /root/reference/src/aerial_manipulation/src/controller.cpp:165-180
// advertises/subscribes robot_states / robot_cmd / drone_pose /
// command/motor_speed / teleoperator / kinovaOper, bridged into Gazebo by
// rotors_gazebo_plugins/gazebo_ros_interface_plugin.cpp).  Instead of a ROS
// master + TCPROS, a single length-prefixed binary framing over one TCP
// socket, with message types mirroring the reference topics and payload
// layouts mirroring its state vector (14 positions + 13 velocities,
// controller.cpp:304-337).

#pragma once

#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace qmm {

constexpr uint32_t kMagic = 0x514D4D31;  // "QMM1"

enum class MsgType : uint32_t {
  kRobotStates = 1,  // 27 floats: base xyz + quat xyzw + arm q(7) | base v(6) + arm qd(7)
  kRobotCmd = 2,     // 7 floats: arm joint effort (reference: JointState.effort)
  kDronePose = 3,    // 3 floats: desired x, y, z setpoint
  kMotorSpeed = 4,   // 8 floats: rotor speed commands
  kTeleopUav = 5,    // 1 float: discrete op code (reference uav_teleop codes 1-9)
  kTeleopArm = 6,    // 1 float: discrete op code (reference kinovaOper codes 1-16)
  kPing = 7,         // 0 floats
  kShutdown = 8,     // 0 floats
  // Action interface (actionlib-style; see bridge/action.py for semantics):
  kActionGoal = 9,      // [goal_id, task, params...]
  kActionFeedback = 10, // [goal_id, status, error]
  kActionResult = 11,   // [goal_id, status, error]
  kActionCancel = 12,   // [goal_id]
  kRpyt = 13,           // 4 floats: roll, pitch, yaw_rate, thrust (joystick)
  kMonitor = 14,        // 0 floats: dashboard poll
  kTelemetry = 15,      // 35 floats: robot_states(27) + drone_target(3) +
                        //            ee_target(3) + [land, gripper_cmd]
  // Camera-frame streaming (gst-camera plugin analog,
  // rotors_gazebo_plugins/src/external/gazebo_gst_camera_plugin.cpp):
  kImage = 16,          // [seq, t, height, width, channels, pixels...]
  kImageReq = 17,       // 0 floats: poll the latest stored frame
};

struct Frame {
  MsgType type;
  std::vector<float> payload;
};

// Serialize: [magic u32][type u32][count u32][count * f32], little-endian.
std::vector<uint8_t> Encode(const Frame& f);

// Incremental decoder: feed bytes, pop complete frames.
class Decoder {
 public:
  void Feed(const uint8_t* data, size_t n);
  bool Pop(Frame* out);

 private:
  std::vector<uint8_t> buf_;
};

// Blocking TCP client used by plant-side tools (teleop, sim adapters).
class BridgeClient {
 public:
  BridgeClient() = default;
  ~BridgeClient();
  // Throws std::runtime_error on failure.
  void Connect(const std::string& host, int port);
  void Send(const Frame& f);
  // Blocks until one frame arrives (or peer closes -> false).
  bool Recv(Frame* out);
  void Close();
  bool connected() const { return fd_ >= 0; }

 private:
  int fd_ = -1;
  Decoder decoder_;
};

}  // namespace qmm
