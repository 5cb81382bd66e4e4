#include "qmm/bridge.hpp"

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

namespace qmm {

namespace {
void PutU32(std::vector<uint8_t>* out, uint32_t v) {
  out->push_back(v & 0xff);
  out->push_back((v >> 8) & 0xff);
  out->push_back((v >> 16) & 0xff);
  out->push_back((v >> 24) & 0xff);
}

uint32_t GetU32(const uint8_t* p) {
  return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
         (uint32_t(p[3]) << 24);
}
}  // namespace

std::vector<uint8_t> Encode(const Frame& f) {
  std::vector<uint8_t> out;
  out.reserve(12 + 4 * f.payload.size());
  PutU32(&out, kMagic);
  PutU32(&out, static_cast<uint32_t>(f.type));
  PutU32(&out, static_cast<uint32_t>(f.payload.size()));
  for (float x : f.payload) {
    uint32_t bits;
    std::memcpy(&bits, &x, 4);
    PutU32(&out, bits);
  }
  return out;
}

void Decoder::Feed(const uint8_t* data, size_t n) {
  buf_.insert(buf_.end(), data, data + n);
}

bool Decoder::Pop(Frame* out) {
  while (true) {
    if (buf_.size() < 12) return false;
    if (GetU32(buf_.data()) != kMagic) {
      // Resync: drop one byte at a time until magic aligns.
      buf_.erase(buf_.begin());
      continue;
    }
    uint32_t count = GetU32(buf_.data() + 8);
    if (count > 1 << 20) {  // corrupt frame guard
      buf_.erase(buf_.begin());
      continue;
    }
    size_t total = 12 + 4 * size_t(count);
    if (buf_.size() < total) return false;
    out->type = static_cast<MsgType>(GetU32(buf_.data() + 4));
    out->payload.resize(count);
    for (uint32_t i = 0; i < count; ++i) {
      uint32_t bits = GetU32(buf_.data() + 12 + 4 * i);
      std::memcpy(&out->payload[i], &bits, 4);
    }
    buf_.erase(buf_.begin(), buf_.begin() + total);
    return true;
  }
}

BridgeClient::~BridgeClient() { Close(); }

void BridgeClient::Connect(const std::string& host, int port) {
  addrinfo hints{};
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  addrinfo* res = nullptr;
  std::string port_s = std::to_string(port);
  if (getaddrinfo(host.c_str(), port_s.c_str(), &hints, &res) != 0 || !res) {
    throw std::runtime_error("qmm bridge: getaddrinfo failed for " + host);
  }
  fd_ = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd_ < 0) {
    freeaddrinfo(res);
    throw std::runtime_error("qmm bridge: socket() failed");
  }
  if (connect(fd_, res->ai_addr, res->ai_addrlen) != 0) {
    freeaddrinfo(res);
    Close();
    throw std::runtime_error("qmm bridge: connect() failed");
  }
  freeaddrinfo(res);
  int one = 1;
  setsockopt(fd_, IPPROTO_TCP, 1 /* TCP_NODELAY */, &one, sizeof(one));
}

void BridgeClient::Send(const Frame& f) {
  auto bytes = Encode(f);
  size_t off = 0;
  while (off < bytes.size()) {
    ssize_t n = write(fd_, bytes.data() + off, bytes.size() - off);
    if (n <= 0) throw std::runtime_error("qmm bridge: write failed");
    off += size_t(n);
  }
}

bool BridgeClient::Recv(Frame* out) {
  uint8_t tmp[4096];
  while (true) {
    if (decoder_.Pop(out)) return true;
    ssize_t n = read(fd_, tmp, sizeof(tmp));
    if (n <= 0) return false;
    decoder_.Feed(tmp, size_t(n));
  }
}

void BridgeClient::Close() {
  if (fd_ >= 0) {
    close(fd_);
    fd_ = -1;
  }
}

}  // namespace qmm
