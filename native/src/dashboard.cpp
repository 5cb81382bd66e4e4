// Live terminal dashboard + control panel — the rqt_rotors GUI analog.
//
// The reference ships an rqt plugin for live vehicle status and mode
// switching (/root/reference/src/rotors_simulator/rqt_rotors/src/rqt_rotors/
// hil_plugin.py). This native tool provides the same observe-and-command
// surface over the QMM bridge without a GUI stack: it polls the solver
// server with kMonitor frames (~10 Hz), renders the shared session's live
// telemetry (base pose/velocity, arm joints, targets, land/gripper flags)
// with ANSI escapes, and forwards keyboard commands as the same teleop op
// codes the dedicated teleop tools use (controller.cpp:741-809 semantics).
//
//   w/s a/d: +-x/+-y      r/f: up/down    q/e: yaw    l: land
//   g/G: gripper close/open               x: quit
//
// Usage: qmm_dashboard [host] [port] [--once] [--camera]
//   --once:   one poll, plain print, no raw terminal (test suite)
//   --camera: also poll the latest camera frame (kImageReq) and render
//             it as ASCII depth art under the telemetry block (the
//             gst-camera plugin's viewer-side analog).

#include <poll.h>
#include <termios.h>
#include <unistd.h>

#include <cmath>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>

#include "qmm/bridge.hpp"

namespace {

struct RawTerm {
  termios saved;
  bool active = false;
  void enable() {
    tcgetattr(STDIN_FILENO, &saved);
    termios raw = saved;
    raw.c_lflag &= ~(ICANON | ECHO);
    raw.c_cc[VMIN] = 0;
    raw.c_cc[VTIME] = 0;
    tcsetattr(STDIN_FILENO, TCSANOW, &raw);
    active = true;
  }
  ~RawTerm() {
    if (active) tcsetattr(STDIN_FILENO, TCSANOW, &saved);
  }
};

const std::map<char, int> kUavCodes = {
    {'w', 1}, {'s', 2}, {'a', 3}, {'d', 4}, {'r', 5},
    {'f', 6}, {'q', 7}, {'e', 8}, {'l', 9},
};

void Render(const std::vector<float>& t, bool once) {
  if (t.size() < 35) return;
  if (!once) std::printf("\x1b[2J\x1b[H");  // clear + home
  std::printf("QMM dashboard — shared solver session\n");
  std::printf("--------------------------------------\n");
  std::printf("base pos   %7.3f %7.3f %7.3f   quat(xyzw) %5.2f %5.2f %5.2f %5.2f\n",
              t[0], t[1], t[2], t[3], t[4], t[5], t[6]);
  std::printf("base vel   %7.3f %7.3f %7.3f   rates      %5.2f %5.2f %5.2f\n",
              t[14], t[15], t[16], t[17], t[18], t[19]);
  std::printf("arm q      ");
  for (int i = 0; i < 7; ++i) std::printf("%6.2f ", t[7 + i]);
  std::printf("\narm qd     ");
  for (int i = 0; i < 7; ++i) std::printf("%6.2f ", t[20 + i]);
  std::printf("\ndrone tgt  %7.3f %7.3f %7.3f\n", t[27], t[28], t[29]);
  std::printf("ee tgt     %7.3f %7.3f %7.3f\n", t[30], t[31], t[32]);
  std::printf("land=%s  gripper_cmd=%.1f\n", t[33] > 0.5f ? "YES" : "no", t[34]);
  if (!once)
    std::printf("\n[w/s a/d r/f: move  q/e: yaw  l: land  g/G: grip  x: quit]\n");
  std::fflush(stdout);
}

// Depth frame -> terminal glyph art (near = dense glyph, far/invalid =
// blank); mirrors bridge/camera.py ascii_depth.
void RenderCamera(const std::vector<float>& p) {
  static const char kRamp[] = " .:-=+*#%@";
  if (p.size() < 5) {
    std::printf("[camera: no frame yet]\n");
    return;
  }
  const int h = int(p[2]), w = int(p[3]), c = int(p[4]);
  if (h <= 0 || w <= 0 || c <= 0 || p.size() < size_t(5 + h * w * c)) return;
  const int sx = w > 64 ? w / 64 : 1;
  const int sy = 2 * sx;
  float maxd = 1e-6f;
  for (int i = 0; i < h * w; ++i) {
    const float v = p[5 + i * c];
    if (std::isfinite(v) && v > maxd) maxd = v;
  }
  std::printf("camera %dx%d (seq %d, t %.2f)\n", w, h, int(p[0]), p[1]);
  for (int y = 0; y < h; y += sy) {
    for (int x = 0; x < w; x += sx) {
      const float v = p[5 + (y * w + x) * c];
      int idx = 0;
      if (std::isfinite(v)) {
        float norm = 1.0f - v / maxd;
        if (norm < 0.0f) norm = 0.0f;
        if (norm > 1.0f) norm = 1.0f;
        idx = int(norm * (sizeof(kRamp) - 2));
      }
      std::putchar(kRamp[idx]);
    }
    std::putchar('\n');
  }
}

}  // namespace

int main(int argc, char** argv) {
  std::string host = "127.0.0.1";
  int port = 17771;
  bool once = false;
  bool camera = false;
  for (int i = 1; i < argc; ++i) {
    if (std::strcmp(argv[i], "--once") == 0) {
      once = true;
    } else if (std::strcmp(argv[i], "--camera") == 0) {
      camera = true;
    } else if (i == 1) {
      host = argv[i];
    } else if (i == 2) {
      port = std::atoi(argv[i]);
    }
  }

  qmm::BridgeClient client;
  try {
    client.Connect(host, port);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "%s\n", e.what());
    return 1;
  }

  RawTerm raw;
  if (!once) raw.enable();

  while (true) {
    client.Send({qmm::MsgType::kMonitor, {}});
    qmm::Frame f;
    if (!client.Recv(&f)) return once ? 1 : 0;
    if (f.type == qmm::MsgType::kTelemetry) Render(f.payload, once);
    if (camera) {
      client.Send({qmm::MsgType::kImageReq, {}});
      qmm::Frame img;
      if (client.Recv(&img) && img.type == qmm::MsgType::kImage)
        RenderCamera(img.payload);
    }
    if (once) return f.type == qmm::MsgType::kTelemetry ? 0 : 1;

    // Poll the keyboard for ~100 ms between telemetry frames.
    pollfd pfd{STDIN_FILENO, POLLIN, 0};
    if (poll(&pfd, 1, 100) > 0 && (pfd.revents & POLLIN)) {
      char c;
      if (read(STDIN_FILENO, &c, 1) == 1) {
        if (c == 'x') return 0;
        if (c == 'g') client.Send({qmm::MsgType::kTeleopArm, {15.0f}});
        else if (c == 'G') client.Send({qmm::MsgType::kTeleopArm, {16.0f}});
        else {
          auto it = kUavCodes.find(c);
          if (it != kUavCodes.end())
            client.Send({qmm::MsgType::kTeleopUav, {float(it->second)}});
        }
      }
    }
  }
}
