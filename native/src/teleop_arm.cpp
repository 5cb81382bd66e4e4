// Arm keyboard teleop — native terminal tool.
//
// Behavioral port of /root/reference/src/aerial_manipulation/src/
// robot_teleop_node.cpp: per-joint +-10 degree nudges and gripper
// open/close, as discrete codes 1-16 (reference kinova_callback,
// controller.cpp:813+), sent over the QMM bridge (MsgType::kTeleopArm).
//
//   1..7: select joint     +/-: nudge selected joint +-10 deg
//   o/c:  gripper open / close      x: quit

#include <termios.h>
#include <unistd.h>

#include <cstdio>

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
  std::printf("qmm arm teleop connected to %s:%d\n", host, port);
  std::printf("1-7: joint   +/-: nudge   o/c: gripper   x: quit\n");

  RawTerm raw;
  int joint = 1;
  char c;
  while (read(STDIN_FILENO, &c, 1) == 1) {
    if (c == 'x') break;
    int code = 0;
    if (c >= '1' && c <= '7') {
      joint = c - '0';
      std::printf("joint %d\r\n", joint);
      continue;
    } else if (c == '+') {
      code = 2 * joint - 1;  // odd codes: +10 deg on joint N
    } else if (c == '-') {
      code = 2 * joint;  // even codes: -10 deg on joint N
    } else if (c == 'c') {
      code = 15;  // gripper close (reference code)
    } else if (c == 'o') {
      code = 16;  // gripper open
    } else {
      continue;
    }
    qmm::Frame f{qmm::MsgType::kTeleopArm, {float(code)}};
    try {
      client.Send(f);
    } catch (const std::exception& e) {
      std::fprintf(stderr, "send failed: %s\n", e.what());
      return 1;
    }
  }
  return 0;
}
