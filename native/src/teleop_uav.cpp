// UAV keyboard teleop — native terminal tool.
//
// Behavioral port of the reference's teleop node
// (/root/reference/src/aerial_manipulation/src/uav_teleop_node.cpp): raw
// termios key loop mapping keys to discrete op codes published for the plant
// controller, which nudges its hover setpoint by +-0.3 m / +-10 deg or
// triggers Land.  Here the codes go over the QMM bridge (MsgType::kTeleopUav)
// instead of a ROS Int16 topic; the code values match the reference's
// gear_callback switch (controller.cpp:741-809).
//
//   w/s: +x / -x      a/d: +y / -y      r/f: up / down
//   q/e: yaw left / yaw right           l:   land
//   x:   quit teleop

#include <termios.h>
#include <unistd.h>

#include <cstdio>
#include <map>

#include "qmm/bridge.hpp"

namespace {

struct RawTerm {
  termios saved;
  RawTerm() {
    tcgetattr(STDIN_FILENO, &saved);
    termios raw = saved;
    raw.c_lflag &= ~(ICANON | ECHO);
    raw.c_cc[VMIN] = 1;
    raw.c_cc[VTIME] = 0;
    tcsetattr(STDIN_FILENO, TCSANOW, &raw);
  }
  ~RawTerm() { tcsetattr(STDIN_FILENO, TCSANOW, &saved); }
};

// Key -> reference op code (controller.cpp gear_callback semantics):
// 1/2: +-x, 3/4: +-y, 5/6: up/down, 7/8: yaw, 9: land.
const std::map<char, int> kCodes = {
    {'w', 1}, {'s', 2}, {'a', 3}, {'d', 4}, {'r', 5},
    {'f', 6}, {'q', 7}, {'e', 8}, {'l', 9},
};

}  // namespace

int main(int argc, char** argv) {
  const char* host = argc > 1 ? argv[1] : "127.0.0.1";
  int port = argc > 2 ? std::atoi(argv[2]) : 17771;

  qmm::BridgeClient client;
  try {
    client.Connect(host, port);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "%s\n", e.what());
    return 1;
  }
  std::printf("qmm uav teleop connected to %s:%d\n", host, port);
  std::printf("w/s a/d: xy   r/f: z   q/e: yaw   l: land   x: quit\n");

  RawTerm raw;
  char c;
  while (read(STDIN_FILENO, &c, 1) == 1) {
    if (c == 'x') break;
    auto it = kCodes.find(c);
    if (it == kCodes.end()) continue;
    qmm::Frame f{qmm::MsgType::kTeleopUav, {float(it->second)}};
    try {
      client.Send(f);
    } catch (const std::exception& e) {
      std::fprintf(stderr, "send failed: %s\n", e.what());
      return 1;
    }
  }
  return 0;
}
