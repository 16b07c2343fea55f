// Native vectorized host environment engine.
//
// TPU-native counterpart of the reference's native env layer (ALE C++ behind
// atari-env-sys, border-atari-env/src/atari_env/ale.rs:62-100): N envs
// stepped in parallel by a worker-thread pool behind a C ABI, so host-bound
// environments (external simulators, emulators) can feed the device through
// the double-buffered async pipeline in border_tpu/envs/native.py.
//
// Pure-JAX envs don't need this path (they run on-device); it exists for
// the class of envs the device cannot express, and as the EnvPool-style
// throughput baseline (PAPERS.md: EnvPool).
//
// Build: make -C cpp   (g++ -O3 -march=native -shared -fPIC)
// ABI: see envpool.h / border_tpu/envs/native.py.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------------
// Env implementations
// ----------------------------------------------------------------------
struct EnvBase {
  virtual ~EnvBase() = default;
  virtual int obs_dim() const = 0;
  virtual int num_actions() const = 0;
  virtual void reset(std::mt19937 &rng, float *obs) = 0;
  // Writes the pre-reset (final) obs to final_obs, then the post-step obs
  // to obs (the new episode's first obs after auto-reset).  final_obs may
  // alias obs — the final write happens first, so aliasing reproduces the
  // plain auto-reset semantics.  The separate final obs is what replay
  // transitions need as next_obs (≙ Step.init_obs bookkeeping of
  // border-core/src/base/env.rs:138-160).
  virtual void step(std::mt19937 &rng, int action, float *obs,
                    float *final_obs, float *reward, uint8_t *terminated,
                    uint8_t *truncated) = 0;
};

// Gymnasium-faithful CartPole-v1 (same constants as the JAX twin in
// border_tpu/envs/classic_control.py, so cross-engine parity is testable).
struct CartPole final : EnvBase {
  float x, x_dot, theta, theta_dot;
  int t = 0;
  static constexpr float kGravity = 9.8f, kMassCart = 1.0f, kMassPole = 0.1f,
                         kLength = 0.5f, kForceMag = 10.0f, kTau = 0.02f;
  static constexpr float kThetaThresh = 12.0f * 2.0f * M_PI / 360.0f;
  static constexpr float kXThresh = 2.4f;
  static constexpr int kMaxSteps = 500;

  int obs_dim() const override { return 4; }
  int num_actions() const override { return 2; }

  void write_obs(float *obs) const {
    obs[0] = x; obs[1] = x_dot; obs[2] = theta; obs[3] = theta_dot;
  }

  void reset(std::mt19937 &rng, float *obs) override {
    std::uniform_real_distribution<float> d(-0.05f, 0.05f);
    x = d(rng); x_dot = d(rng); theta = d(rng); theta_dot = d(rng);
    t = 0;
    write_obs(obs);
  }

  void step(std::mt19937 &rng, int action, float *obs, float *final_obs,
            float *reward, uint8_t *terminated, uint8_t *truncated) override {
    const float force = action == 1 ? kForceMag : -kForceMag;
    const float costh = std::cos(theta), sinth = std::sin(theta);
    const float total_mass = kMassCart + kMassPole;
    const float pml = kMassPole * kLength;
    const float temp = (force + pml * theta_dot * theta_dot * sinth) / total_mass;
    const float thetaacc =
        (kGravity * sinth - costh * temp) /
        (kLength * (4.0f / 3.0f - kMassPole * costh * costh / total_mass));
    const float xacc = temp - pml * thetaacc * costh / total_mass;
    x += kTau * x_dot;
    x_dot += kTau * xacc;
    theta += kTau * theta_dot;
    theta_dot += kTau * thetaacc;
    ++t;
    const bool term = x < -kXThresh || x > kXThresh || theta < -kThetaThresh ||
                      theta > kThetaThresh;
    const bool trunc = !term && t >= kMaxSteps;
    *reward = 1.0f;
    *terminated = term;
    *truncated = trunc;
    write_obs(final_obs);
    if (term || trunc) {
      reset(rng, obs);  // auto-reset: obs is the new episode's first obs
    } else {
      write_obs(obs);
    }
  }
};

// Gymnasium-faithful Pendulum-v1 (continuous control exercised through the
// same discrete C ABI by binning torque into 17 levels; the Python wrapper
// maps continuous actions to bins).
struct Pendulum final : EnvBase {
  float theta, theta_dot;
  int t = 0;
  static constexpr int kBins = 17;
  static constexpr float kMaxSpeed = 8.0f, kMaxTorque = 2.0f, kDt = 0.05f,
                         kG = 10.0f, kM = 1.0f, kL = 1.0f;
  static constexpr int kMaxSteps = 200;

  int obs_dim() const override { return 3; }
  int num_actions() const override { return kBins; }

  void write_obs(float *obs) const {
    obs[0] = std::cos(theta); obs[1] = std::sin(theta); obs[2] = theta_dot;
  }

  void reset(std::mt19937 &rng, float *obs) override {
    std::uniform_real_distribution<float> dth(-M_PI, M_PI);
    std::uniform_real_distribution<float> dv(-1.0f, 1.0f);
    theta = dth(rng); theta_dot = dv(rng); t = 0;
    write_obs(obs);
  }

  void step(std::mt19937 &rng, int action, float *obs, float *final_obs,
            float *reward, uint8_t *terminated, uint8_t *truncated) override {
    const float u = -kMaxTorque + 2.0f * kMaxTorque * action / (kBins - 1);
    float th_norm = std::fmod(theta + M_PI, 2.0f * M_PI);
    if (th_norm < 0) th_norm += 2.0f * M_PI;
    th_norm -= M_PI;
    const float cost = th_norm * th_norm + 0.1f * theta_dot * theta_dot +
                       0.001f * u * u;
    theta_dot += (3.0f * kG / (2.0f * kL) * std::sin(theta) +
                  3.0f / (kM * kL * kL) * u) * kDt;
    theta_dot = std::fmax(-kMaxSpeed, std::fmin(kMaxSpeed, theta_dot));
    theta += theta_dot * kDt;
    ++t;
    const bool trunc = t >= kMaxSteps;
    *reward = -cost;
    *terminated = 0;
    *truncated = trunc;
    write_obs(final_obs);
    if (trunc) reset(rng, obs); else write_obs(obs);
  }
};

EnvBase *make_env(int env_id) {
  switch (env_id) {
    case 0: return new CartPole();
    case 1: return new Pendulum();
    default: return nullptr;
  }
}

// ----------------------------------------------------------------------
// Thread pool stepping N envs in parallel (the actor-thread analogue of
// border-async-trainer's ActorManager, actor_manager/base.rs:141-175,
// minus the channels: results land directly in caller-provided buffers).
// ----------------------------------------------------------------------
struct Pool {
  std::vector<EnvBase *> envs;
  std::vector<std::mt19937> rngs;
  int num_envs = 0, obs_dim = 0, n_threads = 0;

  // work broadcast state
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::function<void(int)> task;  // per-env task
  uint64_t work_epoch = 0;
  std::atomic<int> remaining{0};
  bool shutdown = false;

  Pool(int env_id, int n, uint64_t seed, int threads)
      : num_envs(n), n_threads(threads > 0 ? threads : 1) {
    envs.reserve(n);
    rngs.reserve(n);
    for (int i = 0; i < n; ++i) {
      envs.push_back(make_env(env_id));
      rngs.emplace_back(seed + 0x9e3779b97f4a7c15ULL * (i + 1));
    }
    obs_dim = envs[0]->obs_dim();
    for (int w = 0; w < n_threads; ++w) {
      workers.emplace_back([this, w] { worker_loop(w); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      shutdown = true;
    }
    cv_work.notify_all();
    for (auto &t : workers) t.join();
    for (auto *e : envs) delete e;
  }

  void worker_loop(int w) {
    uint64_t seen = 0;
    for (;;) {
      std::function<void(int)> my_task;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return shutdown || work_epoch != seen; });
        if (shutdown) return;
        seen = work_epoch;
        my_task = task;
      }
      // static round-robin partition of envs over workers
      for (int i = w; i < num_envs; i += n_threads) my_task(i);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        cv_done.notify_all();
      }
    }
  }

  void run(std::function<void(int)> fn) {
    if (n_threads == 1) {
      for (int i = 0; i < num_envs; ++i) fn(i);
      return;
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      task = std::move(fn);
      remaining.store(n_threads);
      ++work_epoch;
    }
    cv_work.notify_all();
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return remaining.load() == 0; });
  }
};

}  // namespace

extern "C" {

void *envpool_create(int env_id, int num_envs, uint64_t seed, int n_threads) {
  if (!make_env(env_id)) return nullptr;
  return new Pool(env_id, num_envs, seed, n_threads);
}

int envpool_obs_dim(void *h) { return static_cast<Pool *>(h)->obs_dim; }

int envpool_num_actions(void *h) {
  return static_cast<Pool *>(h)->envs[0]->num_actions();
}

void envpool_reset(void *h, float *obs_out) {
  Pool *p = static_cast<Pool *>(h);
  const int d = p->obs_dim;
  p->run([=](int i) { p->envs[i]->reset(p->rngs[i], obs_out + i * d); });
}

void envpool_step(void *h, const int32_t *actions, float *obs_out,
                  float *reward_out, uint8_t *term_out, uint8_t *trunc_out) {
  Pool *p = static_cast<Pool *>(h);
  const int d = p->obs_dim;
  p->run([=](int i) {
    // final_obs aliases obs: plain auto-reset semantics (back-compat ABI)
    p->envs[i]->step(p->rngs[i], actions[i], obs_out + i * d, obs_out + i * d,
                     reward_out + i, term_out + i, trunc_out + i);
  });
}

// step + separate pre-reset (final) obs — what replay transitions need as
// next_obs at episode boundaries.
void envpool_step2(void *h, const int32_t *actions, float *obs_out,
                   float *final_obs_out, float *reward_out, uint8_t *term_out,
                   uint8_t *trunc_out) {
  Pool *p = static_cast<Pool *>(h);
  const int d = p->obs_dim;
  p->run([=](int i) {
    p->envs[i]->step(p->rngs[i], actions[i], obs_out + i * d,
                     final_obs_out + i * d, reward_out + i, term_out + i,
                     trunc_out + i);
  });
}

void envpool_destroy(void *h) { delete static_cast<Pool *>(h); }

}  // extern "C"
