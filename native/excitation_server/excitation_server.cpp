// excitation_server — robot-side control bridge for flobaroid_tpu.
//
// Native counterpart of the reference's yarpGYM C++ control module
// (excitation/robotCommunication/yarpGYM/src/excitation_thread.cpp):
// a real-time thread drives the robot at a fixed control rate while a
// network thread accepts position targets and streams back measured
// (q, dq, tau, t) state. The YARP transport is replaced by a plain
// TCP line protocol so the module builds with no robotics middleware;
// integrators implement RobotInterface for their hardware (the
// provided SimRobot backend models PD-controlled joints with viscous +
// Coulomb friction and is used by the loopback tests).
//
// Protocol (newline-delimited ASCII, all angles in rad):
//   client -> server:
//     HELLO                        -> server replies "OK <n_dofs> <rate>"
//     T <q_0> ... <q_{n-1}>        set position targets
//     STREAM <0|1>                 enable/disable state streaming
//     QUIT                         close connection
//   server -> client (while streaming, at the control rate / decimation):
//     S <t> <q...> <dq...> <tau...>
//
// Build:  cmake -B build && cmake --build build
//    or:  g++ -O2 -std=c++17 -pthread excitation_server.cpp -o excitation_server

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------------
// Hardware abstraction: implement this for a real robot (joint encoders,
// torque sensors, position-direct command interface).
// ---------------------------------------------------------------------------
class RobotInterface {
 public:
  virtual ~RobotInterface() = default;
  virtual int num_dofs() const = 0;
  virtual void set_position_targets(const std::vector<double>& q_ref) = 0;
  // advance/refresh the hardware state; dt in seconds
  virtual void step(double dt) = 0;
  virtual void sense(std::vector<double>& q, std::vector<double>& dq,
                     std::vector<double>& tau) = 0;
};

// Simulation backend: PD-position-controlled joints with inertia,
// viscous + Coulomb friction (mirrors the reference's gazebo-loop tests).
class SimRobot : public RobotInterface {
 public:
  explicit SimRobot(int n)
      : n_(n), q_(n, 0.0), dq_(n, 0.0), tau_(n, 0.0), q_ref_(n, 0.0) {}

  int num_dofs() const override { return n_; }

  void set_position_targets(const std::vector<double>& q_ref) override {
    std::lock_guard<std::mutex> lk(mu_);
    q_ref_ = q_ref;
  }

  void step(double dt) override {
    std::lock_guard<std::mutex> lk(mu_);
    const double kp = 400.0, kd = 40.0, inertia = 1.0;
    const double fv = 0.8, fc = 0.3;
    for (int i = 0; i < n_; ++i) {
      double u = kp * (q_ref_[i] - q_[i]) - kd * dq_[i];
      double fric = fv * dq_[i] + fc * std::tanh(dq_[i] / 0.02);
      double ddq = (u - fric) / inertia;
      dq_[i] += ddq * dt;
      q_[i] += dq_[i] * dt;
      tau_[i] = u;  // actuator torque (what a joint torque sensor reads)
    }
  }

  void sense(std::vector<double>& q, std::vector<double>& dq,
             std::vector<double>& tau) override {
    std::lock_guard<std::mutex> lk(mu_);
    q = q_;
    dq = dq_;
    tau = tau_;
  }

 private:
  int n_;
  std::vector<double> q_, dq_, tau_, q_ref_;
  std::mutex mu_;
};

// ---------------------------------------------------------------------------
static std::atomic<bool> g_running{true};

struct Shared {
  std::mutex mu;
  std::vector<double> q, dq, tau;
  double t = 0.0;
};

static void control_loop(RobotInterface* robot, Shared* shared, double rate_hz) {
  using clock = std::chrono::steady_clock;
  const auto period =
      std::chrono::duration<double>(1.0 / rate_hz);
  auto next = clock::now();
  const auto t0 = clock::now();
  std::vector<double> q, dq, tau;
  while (g_running.load()) {
    robot->step(1.0 / rate_hz);
    robot->sense(q, dq, tau);
    {
      std::lock_guard<std::mutex> lk(shared->mu);
      shared->q = q;
      shared->dq = dq;
      shared->tau = tau;
      shared->t = std::chrono::duration<double>(clock::now() - t0).count();
    }
    next += std::chrono::duration_cast<clock::duration>(period);
    std::this_thread::sleep_until(next);
  }
}

static bool send_all(int fd, const std::string& s) {
  size_t off = 0;
  while (off < s.size()) {
    ssize_t n = ::send(fd, s.data() + off, s.size() - off, 0);
    if (n <= 0) return false;
    off += static_cast<size_t>(n);
  }
  return true;
}

static void client_session(int fd, RobotInterface* robot, Shared* shared,
                           double rate_hz, int decimation) {
  std::atomic<bool> streaming{false};
  std::atomic<bool> alive{true};

  std::thread streamer([&]() {
    using clock = std::chrono::steady_clock;
    const auto period = std::chrono::duration<double>(decimation / rate_hz);
    auto next = clock::now();
    while (alive.load() && g_running.load()) {
      if (streaming.load()) {
        std::ostringstream os;
        {
          std::lock_guard<std::mutex> lk(shared->mu);
          os << "S " << shared->t;
          for (double v : shared->q) os << ' ' << v;
          for (double v : shared->dq) os << ' ' << v;
          for (double v : shared->tau) os << ' ' << v;
        }
        os << '\n';
        if (!send_all(fd, os.str())) break;
      }
      next += std::chrono::duration_cast<clock::duration>(period);
      std::this_thread::sleep_until(next);
    }
  });

  std::string buf;
  char chunk[4096];
  const int n = robot->num_dofs();
  while (alive.load()) {
    ssize_t r = ::recv(fd, chunk, sizeof(chunk), 0);
    if (r <= 0) break;
    buf.append(chunk, static_cast<size_t>(r));
    size_t pos;
    while ((pos = buf.find('\n')) != std::string::npos) {
      std::string line = buf.substr(0, pos);
      buf.erase(0, pos + 1);
      std::istringstream is(line);
      std::string cmd;
      is >> cmd;
      if (cmd == "HELLO") {
        std::ostringstream os;
        os << "OK " << n << ' ' << rate_hz << '\n';
        send_all(fd, os.str());
      } else if (cmd == "T") {
        std::vector<double> q_ref(n, 0.0);
        bool ok = true;
        for (int i = 0; i < n; ++i)
          if (!(is >> q_ref[i])) {
            ok = false;
            break;
          }
        if (ok) robot->set_position_targets(q_ref);
      } else if (cmd == "STREAM") {
        int v = 0;
        is >> v;
        streaming.store(v != 0);
      } else if (cmd == "QUIT") {
        alive.store(false);
      }
    }
  }
  alive.store(false);
  streamer.join();
  ::close(fd);
}

int main(int argc, char** argv) {
  int n_dofs = 7;
  int port = 7777;
  double rate_hz = 1000.0;
  int decimation = 5;  // stream at rate/decimation
  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "--dofs") && i + 1 < argc) n_dofs = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--port") && i + 1 < argc) port = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--rate") && i + 1 < argc) rate_hz = atof(argv[++i]);
    else if (!strcmp(argv[i], "--decimation") && i + 1 < argc) decimation = atoi(argv[++i]);
  }

  SimRobot robot(n_dofs);
  Shared shared;
  shared.q.assign(n_dofs, 0.0);
  shared.dq.assign(n_dofs, 0.0);
  shared.tau.assign(n_dofs, 0.0);
  std::thread ctrl(control_loop, &robot, &shared, rate_hz);

  int srv = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    perror("bind");
    return 1;
  }
  listen(srv, 1);
  fprintf(stderr, "excitation_server: %d dofs, %.0f Hz control, port %d\n",
          n_dofs, rate_hz, port);
  while (g_running.load()) {
    int fd = ::accept(srv, nullptr, nullptr);
    if (fd < 0) break;
    client_session(fd, &robot, &shared, rate_hz, decimation);
  }
  g_running.store(false);
  ctrl.join();
  ::close(srv);
  return 0;
}
