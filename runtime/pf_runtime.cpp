/* pf_runtime.cpp — implementation. See pf_runtime.h for the design. */

#include "pf_runtime.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cerrno>
#include <cstring>
#include <ctime>
#include <thread>

namespace {

constexpr uint16_t kTypeState = 1;
constexpr uint16_t kTypeImu = 2;
constexpr uint16_t kTypeCmd = 3;
constexpr uint16_t kTypeOdom = 4;
constexpr uint16_t kTypeDiag = 5;
constexpr uint16_t kTypeEstOdom = 6;

struct WireHeader {
  uint32_t magic;
  uint16_t version;
  uint16_t type;
  uint64_t seq;
};

/* Seqlock-style latest-value mailbox: single native writer (the receive
 * thread), any number of readers.  Readers retry while the sequence is odd
 * or changes mid-copy.  This replaces the reference's mutex around the SDK
 * callback (src/pf_controller_base.cpp:23-28) with a wait-free reader. */
template <typename T>
class Mailbox {
 public:
  void write(const T &v) {
    uint64_t s = seq_.load(std::memory_order_relaxed);
    seq_.store(s + 1, std::memory_order_release); /* odd: write in flight */
    value_ = v;
    seq_.store(s + 2, std::memory_order_release);
    count_.fetch_add(1, std::memory_order_relaxed);
  }
  /* Returns 1 and fills out if data newer than *last_read; 0 otherwise. */
  int read_fresh(T *out, uint64_t *last_read) const {
    for (;;) {
      uint64_t s1 = seq_.load(std::memory_order_acquire);
      if (s1 & 1) continue;
      if (s1 == 0 || s1 == *last_read) return 0;
      T copy = value_;
      uint64_t s2 = seq_.load(std::memory_order_acquire);
      if (s1 == s2) {
        *out = copy;
        *last_read = s1;
        return 1;
      }
    }
  }
  uint64_t count() const { return count_.load(std::memory_order_relaxed); }

 private:
  std::atomic<uint64_t> seq_{0};
  std::atomic<uint64_t> count_{0};
  T value_{};
};

int udp_socket_bound(uint16_t port) {
  int fd = ::socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -errno;
  int one = 1;
  ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(port);
  if (::bind(fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) < 0) {
    int e = -errno;
    ::close(fd);
    return e;
  }
  return fd;
}

sockaddr_in make_addr(const char *ip, uint16_t port) {
  sockaddr_in a{};
  a.sin_family = AF_INET;
  a.sin_port = htons(port);
  ::inet_pton(AF_INET, ip, &a.sin_addr);
  return a;
}

template <typename T>
bool parse_packet(const uint8_t *buf, ssize_t n, uint16_t want_type,
                  T *out) {
  if (n != static_cast<ssize_t>(sizeof(WireHeader) + sizeof(T))) {
    return false;
  }
  WireHeader h;
  std::memcpy(&h, buf, sizeof(h));
  if (h.magic != PFRT_MAGIC || h.version != PFRT_VERSION ||
      h.type != want_type) {
    return false;
  }
  std::memcpy(out, buf + sizeof(WireHeader), sizeof(T));
  return true;
}

template <typename T>
int send_packet(int fd, const sockaddr_in &to, uint16_t type, uint64_t seq,
                const T &payload) {
  uint8_t buf[sizeof(WireHeader) + sizeof(T)];
  WireHeader h{PFRT_MAGIC, PFRT_VERSION, type, seq};
  std::memcpy(buf, &h, sizeof(h));
  std::memcpy(buf + sizeof(h), &payload, sizeof(T));
  ssize_t n = ::sendto(fd, buf, sizeof(buf), 0,
                       reinterpret_cast<const sockaddr *>(&to), sizeof(to));
  return n == static_cast<ssize_t>(sizeof(buf)) ? 0 : -errno;
}

}  // namespace

/* ---------------- controller side ---------------- */

struct pfrt_link {
  int state_fd = -1;
  int cmd_fd = -1;
  sockaddr_in cmd_addr{};
  std::thread rx_thread;
  std::atomic<bool> running{false};
  Mailbox<pfrt_robot_state> state_box;
  Mailbox<pfrt_imu_data> imu_box;
  Mailbox<pfrt_odom> odom_box;
  Mailbox<pfrt_diag> diag_box;
  uint64_t state_last = 0, imu_last = 0, odom_last = 0, diag_last = 0;
  uint64_t cmd_seq = 0;
};

static void link_rx_loop(pfrt_link *l) {
  uint8_t buf[512];
  while (l->running.load(std::memory_order_relaxed)) {
    ssize_t n = ::recv(l->state_fd, buf, sizeof(buf), 0);
    if (n <= 0) continue; /* timeout tick to re-check running */
    pfrt_robot_state s;
    pfrt_imu_data imu;
    pfrt_odom od;
    pfrt_diag dg;
    if (parse_packet(buf, n, kTypeState, &s)) {
      l->state_box.write(s);
    } else if (parse_packet(buf, n, kTypeImu, &imu)) {
      l->imu_box.write(imu);
    } else if (parse_packet(buf, n, kTypeOdom, &od)) {
      l->odom_box.write(od);
    } else if (parse_packet(buf, n, kTypeDiag, &dg)) {
      l->diag_box.write(dg);
    }
  }
}

pfrt_link *pfrt_connect(const char *host_ip, uint16_t state_port,
                        uint16_t cmd_port) {
  auto *l = new pfrt_link();
  l->state_fd = udp_socket_bound(state_port);
  l->cmd_fd = ::socket(AF_INET, SOCK_DGRAM, 0);
  if (l->state_fd < 0 || l->cmd_fd < 0) {
    delete l;
    return nullptr;
  }
  timeval tv{0, 50 * 1000}; /* 50 ms rx timeout so the thread can exit */
  ::setsockopt(l->state_fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  l->cmd_addr = make_addr(host_ip, cmd_port);
  l->running.store(true);
  l->rx_thread = std::thread(link_rx_loop, l);
  return l;
}

void pfrt_link_close(pfrt_link *l) {
  if (!l) return;
  l->running.store(false);
  if (l->rx_thread.joinable()) l->rx_thread.join();
  if (l->state_fd >= 0) ::close(l->state_fd);
  if (l->cmd_fd >= 0) ::close(l->cmd_fd);
  delete l;
}

int pfrt_recv_state(pfrt_link *l, pfrt_robot_state *out) {
  return l->state_box.read_fresh(out, &l->state_last);
}

int pfrt_recv_imu(pfrt_link *l, pfrt_imu_data *out) {
  return l->imu_box.read_fresh(out, &l->imu_last);
}

int pfrt_recv_odom(pfrt_link *l, pfrt_odom *out) {
  return l->odom_box.read_fresh(out, &l->odom_last);
}

int pfrt_recv_diag(pfrt_link *l, pfrt_diag *out) {
  return l->diag_box.read_fresh(out, &l->diag_last);
}

int pfrt_send_cmd(pfrt_link *l, const pfrt_robot_cmd *cmd) {
  return send_packet(l->cmd_fd, l->cmd_addr, kTypeCmd, ++l->cmd_seq, *cmd);
}

int pfrt_send_est_odom(pfrt_link *l, const pfrt_est_odom *o) {
  /* rides the cmd socket to the same host endpoint; the host rx loop
   * demultiplexes on the packet type */
  return send_packet(l->cmd_fd, l->cmd_addr, kTypeEstOdom, ++l->cmd_seq, *o);
}

uint64_t pfrt_link_state_count(const pfrt_link *l) {
  return l->state_box.count();
}

/* ---------------- robot / simulator side ---------------- */

struct pfrt_host {
  int cmd_fd = -1;
  int state_fd = -1;
  sockaddr_in state_addr{};
  std::atomic<bool> have_peer{false};
  std::thread rx_thread;
  std::atomic<bool> running{false};
  Mailbox<pfrt_robot_cmd> cmd_box;
  Mailbox<pfrt_est_odom> est_odom_box;
  uint64_t cmd_last = 0, est_odom_last = 0;
  uint64_t state_seq = 0;
  uint16_t peer_state_port = 0;
};

static void host_rx_loop(pfrt_host *h) {
  uint8_t buf[512];
  sockaddr_in from{};
  socklen_t from_len = sizeof(from);
  while (h->running.load(std::memory_order_relaxed)) {
    ssize_t n = ::recvfrom(h->cmd_fd, buf, sizeof(buf), 0,
                           reinterpret_cast<sockaddr *>(&from), &from_len);
    if (n <= 0) continue;
    pfrt_robot_cmd c;
    pfrt_est_odom eo;
    if (parse_packet(buf, n, kTypeCmd, &c)) {
      h->cmd_box.write(c);
      /* learn the controller's address for state publication */
      sockaddr_in sa = from;
      sa.sin_port = htons(h->peer_state_port);
      h->state_addr = sa;
      h->have_peer.store(true, std::memory_order_release);
    } else if (parse_packet(buf, n, kTypeEstOdom, &eo)) {
      h->est_odom_box.write(eo);
    }
  }
}

pfrt_host *pfrt_serve(uint16_t state_port, uint16_t cmd_port) {
  auto *h = new pfrt_host();
  h->cmd_fd = udp_socket_bound(cmd_port);
  h->state_fd = ::socket(AF_INET, SOCK_DGRAM, 0);
  if (h->cmd_fd < 0 || h->state_fd < 0) {
    delete h;
    return nullptr;
  }
  timeval tv{0, 50 * 1000};
  ::setsockopt(h->cmd_fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  h->peer_state_port = state_port;
  /* default peer: localhost (loopback sim) until a cmd reveals the peer */
  h->state_addr = make_addr("127.0.0.1", state_port);
  h->running.store(true);
  h->rx_thread = std::thread(host_rx_loop, h);
  return h;
}

void pfrt_host_close(pfrt_host *h) {
  if (!h) return;
  h->running.store(false);
  if (h->rx_thread.joinable()) h->rx_thread.join();
  if (h->cmd_fd >= 0) ::close(h->cmd_fd);
  if (h->state_fd >= 0) ::close(h->state_fd);
  delete h;
}

int pfrt_publish_state(pfrt_host *h, const pfrt_robot_state *s,
                       const pfrt_imu_data *imu) {
  int rc = send_packet(h->state_fd, h->state_addr, kTypeState,
                       ++h->state_seq, *s);
  if (rc != 0) return rc;
  if (imu != nullptr) {
    rc = send_packet(h->state_fd, h->state_addr, kTypeImu, h->state_seq,
                     *imu);
  }
  return rc;
}

int pfrt_publish_odom(pfrt_host *h, const pfrt_odom *o) {
  return send_packet(h->state_fd, h->state_addr, kTypeOdom, ++h->state_seq,
                     *o);
}

int pfrt_publish_diag(pfrt_host *h, const pfrt_diag *d) {
  return send_packet(h->state_fd, h->state_addr, kTypeDiag, ++h->state_seq,
                     *d);
}

int pfrt_poll_cmd(pfrt_host *h, pfrt_robot_cmd *out) {
  return h->cmd_box.read_fresh(out, &h->cmd_last);
}

int pfrt_poll_est_odom(pfrt_host *h, pfrt_est_odom *out) {
  return h->est_odom_box.read_fresh(out, &h->est_odom_last);
}

uint64_t pfrt_host_cmd_count(const pfrt_host *h) { return h->cmd_box.count(); }

/* ---------------- rate loop ---------------- */

struct pfrt_rate {
  struct timespec next;
  long period_ns;
};

pfrt_rate *pfrt_rate_new(double hz) {
  auto *r = new pfrt_rate();
  r->period_ns = static_cast<long>(1e9 / hz);
  clock_gettime(CLOCK_MONOTONIC, &r->next);
  return r;
}

void pfrt_rate_free(pfrt_rate *r) { delete r; }

static void ts_add_ns(struct timespec *t, long ns) {
  t->tv_nsec += ns;
  while (t->tv_nsec >= 1000000000L) {
    t->tv_nsec -= 1000000000L;
    t->tv_sec += 1;
  }
}

int pfrt_rate_sleep(pfrt_rate *r) {
  ts_add_ns(&r->next, r->period_ns);
  struct timespec now;
  clock_gettime(CLOCK_MONOTONIC, &now);
  long behind_ns = (now.tv_sec - r->next.tv_sec) * 1000000000L +
                   (now.tv_nsec - r->next.tv_nsec);
  int missed = 0;
  if (behind_ns > 0) {
    missed = static_cast<int>(behind_ns / r->period_ns) + 1;
    /* resync to the next future deadline, keeping phase */
    ts_add_ns(&r->next, static_cast<long>(missed) * r->period_ns);
  }
  while (clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &r->next,
                         nullptr) == EINTR) {
  }
  return missed;
}

uint64_t pfrt_now_ns(void) {
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return static_cast<uint64_t>(t.tv_sec) * 1000000000ull + t.tv_nsec;
}
