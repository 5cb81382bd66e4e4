// Bridge round-trip test client: connects to the Python solver server,
// sends one robot_states frame (the reference's 14+13 layout), expects a
// robot_cmd (7 efforts) and a drone_pose (3 floats) back, prints them and
// exits 0.  Driven by tests/test_bridge.py.

#include <cstdio>
#include <cstdlib>

#include "qmm/bridge.hpp"

int main(int argc, char** argv) {
  const char* host = argc > 1 ? argv[1] : "127.0.0.1";
  int port = argc > 2 ? std::atoi(argv[2]) : 17771;

  qmm::BridgeClient client;
  try {
    client.Connect(host, port);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "connect: %s\n", e.what());
    return 2;
  }

  // robot_states: base xyz(3) + quat xyzw(4) + arm q(7) | base v(6) + qd(7).
  std::vector<float> state(27, 0.0f);
  state[2] = 2.1f;   // z
  state[6] = 1.0f;   // quat w (xyzw layout -> w last)
  for (int j = 0; j < 7; ++j) state[7 + j] = 0.5f;
  client.Send({qmm::MsgType::kRobotStates, state});

  bool got_cmd = false, got_pose = false;
  qmm::Frame f;
  while ((!got_cmd || !got_pose) && client.Recv(&f)) {
    if (f.type == qmm::MsgType::kRobotCmd && f.payload.size() == 7) {
      std::printf("robot_cmd:");
      for (float x : f.payload) std::printf(" %.4f", x);
      std::printf("\n");
      got_cmd = true;
    } else if (f.type == qmm::MsgType::kDronePose && f.payload.size() == 3) {
      std::printf("drone_pose: %.4f %.4f %.4f\n", f.payload[0], f.payload[1],
                  f.payload[2]);
      got_pose = true;
    }
  }
  client.Send({qmm::MsgType::kShutdown, {}});
  return (got_cmd && got_pose) ? 0 : 3;
}
