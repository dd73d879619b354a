// Native runtime for rl_mpc_locomotion_tpu: telemetry logger + gamepad.
//
// The reference's runtime-side components are Python (MPC_Controller/
// Logger.py pickles frames on the control thread; RL_Environment/
// gamepad_reader.py polls on a Python thread). Here both are C++ so the
// host-side control loop never blocks on IO:
//
// - TelemetryLogger: single-producer single-consumer lock-free ring buffer
//   of fixed-size float frames, drained to a binary file by a background
//   thread. Push is wait-free (drops + counts when full).
// - Gamepad: Linux joystick API (/dev/input/js*) reader thread keeping a
//   latest-state snapshot; same axes/buttons the reference maps
//   (gamepad_reader.py:61-132).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// ---------------------------------------------------------------- telemetry
struct TelemetryLogger {
  std::vector<float> ring;       // capacity * frame_size
  size_t frame_size;
  size_t capacity;
  std::atomic<uint64_t> head{0};  // producer index (frames)
  std::atomic<uint64_t> tail{0};  // consumer index (frames)
  std::atomic<uint64_t> dropped{0};
  std::atomic<bool> running{true};
  FILE* file = nullptr;
  std::thread writer;

  TelemetryLogger(const char* path, size_t frame_size_, size_t capacity_)
      : ring(frame_size_ * capacity_), frame_size(frame_size_),
        capacity(capacity_) {
    file = std::fopen(path, "wb");
    if (file) {
      // header: magic, version, frame_size
      const uint32_t magic = 0x524c4d43;  // "RLMC"
      const uint32_t version = 1;
      const uint32_t fs = static_cast<uint32_t>(frame_size);
      std::fwrite(&magic, 4, 1, file);
      std::fwrite(&version, 4, 1, file);
      std::fwrite(&fs, 4, 1, file);
    }
    writer = std::thread([this] { this->drain_loop(); });
  }

  ~TelemetryLogger() {
    running.store(false, std::memory_order_release);
    if (writer.joinable()) writer.join();
    if (file) {
      drain_once();
      std::fclose(file);
    }
  }

  bool push(const float* data, size_t n) {
    if (n != frame_size) return false;
    uint64_t h = head.load(std::memory_order_relaxed);
    uint64_t t = tail.load(std::memory_order_acquire);
    if (h - t >= capacity) {
      dropped.fetch_add(1, std::memory_order_relaxed);
      return false;
    }
    std::memcpy(&ring[(h % capacity) * frame_size], data,
                frame_size * sizeof(float));
    head.store(h + 1, std::memory_order_release);
    return true;
  }

  void drain_once() {
    if (!file) return;
    uint64_t h = head.load(std::memory_order_acquire);
    uint64_t t = tail.load(std::memory_order_relaxed);
    while (t < h) {
      std::fwrite(&ring[(t % capacity) * frame_size], sizeof(float),
                  frame_size, file);
      ++t;
    }
    tail.store(t, std::memory_order_release);
    std::fflush(file);
  }

  void drain_loop() {
    while (running.load(std::memory_order_acquire)) {
      drain_once();
      std::this_thread::sleep_for(std::chrono::milliseconds(5));
    }
  }
};

// ----------------------------------------------------------------- gamepad
struct js_event_raw {
  uint32_t time;
  int16_t value;
  uint8_t type;
  uint8_t number;
};

constexpr uint8_t JS_EVENT_BUTTON = 0x01;
constexpr uint8_t JS_EVENT_AXIS = 0x02;

struct Gamepad {
  int fd = -1;
  std::atomic<bool> running{true};
  std::thread reader;
  std::atomic<int16_t> axes[8];
  std::atomic<uint8_t> buttons[16];
  std::atomic<uint64_t> events{0};

  explicit Gamepad(const char* path) {
    for (auto& a : axes) a.store(0);
    for (auto& b : buttons) b.store(0);
    fd = ::open(path, O_RDONLY | O_NONBLOCK);
    reader = std::thread([this] { this->read_loop(); });
  }

  ~Gamepad() {
    running.store(false);
    if (reader.joinable()) reader.join();
    if (fd >= 0) ::close(fd);
  }

  void read_loop() {
    while (running.load(std::memory_order_acquire)) {
      if (fd < 0) {
        std::this_thread::sleep_for(std::chrono::milliseconds(100));
        continue;
      }
      js_event_raw ev;
      ssize_t n = ::read(fd, &ev, sizeof(ev));
      if (n == sizeof(ev)) {
        events.fetch_add(1, std::memory_order_relaxed);
        uint8_t type = ev.type & 0x7f;  // strip JS_EVENT_INIT
        if (type == JS_EVENT_AXIS && ev.number < 8)
          axes[ev.number].store(ev.value, std::memory_order_relaxed);
        else if (type == JS_EVENT_BUTTON && ev.number < 16)
          buttons[ev.number].store(ev.value != 0,
                                   std::memory_order_relaxed);
      } else {
        std::this_thread::sleep_for(std::chrono::milliseconds(2));
      }
    }
  }
};

}  // namespace

extern "C" {

void* rt_logger_create(const char* path, int frame_size, int capacity) {
  return new TelemetryLogger(path, static_cast<size_t>(frame_size),
                             static_cast<size_t>(capacity));
}

int rt_logger_push(void* h, const float* data, int n) {
  return static_cast<TelemetryLogger*>(h)->push(data,
                                                static_cast<size_t>(n))
             ? 1
             : 0;
}

uint64_t rt_logger_dropped(void* h) {
  return static_cast<TelemetryLogger*>(h)->dropped.load();
}

void rt_logger_flush(void* h) { static_cast<TelemetryLogger*>(h)->drain_once(); }

void rt_logger_destroy(void* h) { delete static_cast<TelemetryLogger*>(h); }

void* rt_gamepad_open(const char* path) {
  auto* gp = new Gamepad(path);
  return gp;
}

int rt_gamepad_connected(void* h) {
  return static_cast<Gamepad*>(h)->fd >= 0 ? 1 : 0;
}

void rt_gamepad_state(void* h, int16_t* axes_out, uint8_t* buttons_out) {
  auto* gp = static_cast<Gamepad*>(h);
  for (int i = 0; i < 8; ++i) axes_out[i] = gp->axes[i].load();
  for (int i = 0; i < 16; ++i) buttons_out[i] = gp->buttons[i].load();
}

void rt_gamepad_close(void* h) { delete static_cast<Gamepad*>(h); }

}  // extern "C"
