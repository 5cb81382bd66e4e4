// Joystick flight interface — native tool.
//
// Behavioral port of the reference's rotors_joy_interface
// (/root/reference/src/rotors_simulator/rotors_joy_interface/src/joy.cpp):
// joystick axes/buttons -> RollPitchYawrateThrust commands.  Axis mapping
// and scales mirror the reference defaults (joy.cpp:40-54): axis 0 = roll
// (direction -1), axis 1 = pitch (+1), axis 2 = thrust (+1, mapped
// (v+1)/2 * max_thrust); buttons 4/3 = yaw left/right at +-45 deg/s; max
// roll/pitch 10 deg, max thrust 30 N.  Commands go over the QMM bridge as
// MsgType::kRpyt frames ([roll, pitch, yaw_rate, thrust]) instead of a ROS
// topic; plant adapters feed them to
// sim/flight_control.roll_pitch_yawrate_thrust_step.
//
// Reads the Linux joystick API (struct js_event from <linux/joystick.h>
// layout: u32 time, s16 value, u8 type, u8 number) from --device
// (default /dev/input/js0).  The device may be any readable stream of
// js_event records, which is how the test harness drives it headlessly;
// --max-events N exits after N events for such scripted runs.

#include <fcntl.h>
#include <unistd.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#include "qmm/bridge.hpp"

namespace {

constexpr uint8_t kEventButton = 0x01;
constexpr uint8_t kEventAxis = 0x02;
constexpr uint8_t kEventInit = 0x80;

struct JsEvent {
  uint32_t time;
  int16_t value;
  uint8_t type;
  uint8_t number;
};
static_assert(sizeof(JsEvent) == 8, "js_event layout");

struct Config {
  std::string host = "127.0.0.1";
  int port = 17771;
  std::string device = "/dev/input/js0";
  long max_events = -1;  // -1 = run until EOF / error
  // Reference defaults (joy.cpp:40-54).
  int axis_roll = 0, axis_pitch = 1, axis_thrust = 2;
  double dir_roll = -1.0, dir_pitch = 1.0, dir_thrust = 1.0;
  double max_roll = 10.0 * M_PI / 180.0;
  double max_pitch = 10.0 * M_PI / 180.0;
  double max_yaw_rate = 45.0 * M_PI / 180.0;
  double max_thrust = 30.0;
  int button_yaw_left = 4, button_yaw_right = 3;
};

}  // namespace

int main(int argc, char** argv) {
  Config cfg;
  for (int i = 1; i + 1 < argc; i += 2) {
    std::string k = argv[i];
    const char* v = argv[i + 1];
    if (k == "--host") cfg.host = v;
    else if (k == "--port") cfg.port = std::atoi(v);
    else if (k == "--device") cfg.device = v;
    else if (k == "--max-events") cfg.max_events = std::atol(v);
    else if (k == "--max-thrust") cfg.max_thrust = std::atof(v);
    else {
      std::fprintf(stderr, "unknown arg %s\n", k.c_str());
      return 2;
    }
  }

  int fd = open(cfg.device.c_str(), O_RDONLY);
  if (fd < 0) {
    std::perror(cfg.device.c_str());
    return 1;
  }

  qmm::BridgeClient client;
  try {
    client.Connect(cfg.host.c_str(), cfg.port);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "%s\n", e.what());
    close(fd);
    return 1;
  }
  std::fprintf(stderr, "qmm joy teleop: %s -> %s:%d\n", cfg.device.c_str(),
               cfg.host.c_str(), cfg.port);

  float axes[16] = {0};
  double yaw_rate = 0.0;
  long n_events = 0;
  JsEvent ev;
  while (cfg.max_events < 0 || n_events < cfg.max_events) {
    ssize_t n = read(fd, &ev, sizeof(ev));
    if (n != sizeof(ev)) break;
    ++n_events;
    const uint8_t type = ev.type & ~kEventInit;
    if (type == kEventAxis && ev.number < 16) {
      axes[ev.number] = float(ev.value) / 32767.0f;  // normalize to [-1, 1]
    } else if (type == kEventButton) {
      if (ev.number == cfg.button_yaw_left)
        yaw_rate = ev.value ? cfg.max_yaw_rate : 0.0;
      else if (ev.number == cfg.button_yaw_right)
        yaw_rate = ev.value ? -cfg.max_yaw_rate : 0.0;
    } else {
      continue;
    }
    // Reference scaling: roll/pitch proportional; thrust = (v+1)/2 * max.
    const float roll = float(axes[cfg.axis_roll] * cfg.max_roll * cfg.dir_roll);
    const float pitch =
        float(axes[cfg.axis_pitch] * cfg.max_pitch * cfg.dir_pitch);
    const float thrust = float((axes[cfg.axis_thrust] + 1.0) *
                               cfg.max_thrust / 2.0 * cfg.dir_thrust);
    qmm::Frame f{qmm::MsgType::kRpyt, {roll, pitch, float(yaw_rate), thrust}};
    try {
      client.Send(f);
    } catch (const std::exception& e) {
      std::fprintf(stderr, "send failed: %s\n", e.what());
      close(fd);
      return 1;
    }
  }
  close(fd);
  return 0;
}
