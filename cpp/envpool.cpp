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

#include <algorithm>
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
  virtual int obs_dim() const = 0;           // elements per env
  virtual int obs_dtype() const { return 0; }  // 0 = f32, 1 = u8
  virtual int num_actions() const = 0;
  virtual void reset(std::mt19937 &rng, void *obs) = 0;
  // Writes the pre-reset (final) obs to final_obs, then the post-step obs
  // to obs (the new episode's first obs after auto-reset).  final_obs may
  // alias obs — the final write happens first, so aliasing reproduces the
  // plain auto-reset semantics.  The separate final obs is what replay
  // transitions need as next_obs (≙ Step.init_obs bookkeeping of
  // border-core/src/base/env.rs:138-160).
  virtual void step(std::mt19937 &rng, int action, void *obs,
                    void *final_obs, float *reward, uint8_t *terminated,
                    uint8_t *truncated) = 0;
  int obs_bytes() const { return obs_dim() * (obs_dtype() == 0 ? 4 : 1); }
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

  void reset(std::mt19937 &rng, void *obs_v) override {
    float *obs = static_cast<float *>(obs_v);
    std::uniform_real_distribution<float> d(-0.05f, 0.05f);
    x = d(rng); x_dot = d(rng); theta = d(rng); theta_dot = d(rng);
    t = 0;
    write_obs(obs);
  }

  void step(std::mt19937 &rng, int action, void *obs_v, void *final_obs_v,
            float *reward, uint8_t *terminated, uint8_t *truncated) override {
    float *obs = static_cast<float *>(obs_v);
    float *final_obs = static_cast<float *>(final_obs_v);
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

  void reset(std::mt19937 &rng, void *obs_v) override {
    float *obs = static_cast<float *>(obs_v);
    std::uniform_real_distribution<float> dth(-M_PI, M_PI);
    std::uniform_real_distribution<float> dv(-1.0f, 1.0f);
    theta = dth(rng); theta_dot = dv(rng); t = 0;
    write_obs(obs);
  }

  void step(std::mt19937 &rng, int action, void *obs_v, void *final_obs_v,
            float *reward, uint8_t *terminated, uint8_t *truncated) override {
    float *obs = static_cast<float *>(obs_v);
    float *final_obs = static_cast<float *>(final_obs_v);
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

// 84×84 uint8 pixel Pong — the host-native C++ twin of the on-device JAX
// game (border_tpu/envs/pong.py: same geometry, serve scheme, opponent AI)
// with the DQN-paper preprocessing stack inline (≙ the reference's
// BorderAtariEnv over C++ ALE, border-atari-env/src/env.rs:126-199):
// 4-frame action repeat with max-pool of the last two raw frames, 4-frame
// stack ring, sign reward clip in train mode, 27k-frame episode cap.
// Observation: [84, 84, 4] uint8 channels-last (28224 bytes), newest frame
// in the last channel — identical layout to the device PixelEnv, so the
// same AtariCNN consumes either source.
struct PixelPong final : EnvBase {
  static constexpr int kH = 84, kW = 84, kStack = 4;
  static constexpr int kFrame = kH * kW;
  static constexpr float kPaddleHalf = 0.075f, kAgentX = 0.92f,
                         kOppX = 0.08f, kPaddleW = 0.02f, kBallR = 0.012f,
                         kBallSpeedX = 0.0175f, kBallVyMax = 0.024f,
                         kPaddleSpeed = 0.022f, kOppSpeed = 0.0145f;
  static constexpr int kWinScore = 21, kServeFrames = 20, kFrameSkip = 4;
  static constexpr int kMaxFrames = 27000;

  bool clip_reward;  // train mode: sign clip (≙ env.rs:154-164)
  // game state
  float bx, by, vx, vy, agent_y, opp_y;
  int score_a = 0, score_o = 0, serve_timer = 0, frame_count = 0;
  // stack ring: planes[(start + k) % 4] is the k-th oldest frame
  uint8_t planes[kStack][kFrame];
  int start = 0;

  explicit PixelPong(bool clip) : clip_reward(clip) {}

  int obs_dim() const override { return kFrame * kStack; }
  int obs_dtype() const override { return 1; }
  int num_actions() const override { return 6; }

  void serve(std::mt19937 &rng, bool toward_agent) {
    std::uniform_real_distribution<float> dvy(-kBallVyMax, kBallVyMax);
    std::uniform_real_distribution<float> dy(0.3f, 0.7f);
    vy = dvy(rng);
    by = dy(rng);
    bx = 0.5f;
    vx = toward_agent ? kBallSpeedX : -kBallSpeedX;
    serve_timer = kServeFrames;
  }

  // one emulator frame (≙ Pong.frame_step, envs/pong.py)
  // returns reward; sets done
  float frame_step(std::mt19937 &rng, int a, bool *done) {
    const bool up = a == 2 || a == 4;
    const bool down = a == 3 || a == 5;
    const float move = (down ? 1.0f : 0.0f) - (up ? 1.0f : 0.0f);
    agent_y = std::fmax(kPaddleHalf,
                        std::fmin(1.0f - kPaddleHalf,
                                  agent_y + move * kPaddleSpeed));
    // opponent: track when approaching, drift to center otherwise
    const float target = vx < 0 ? by : 0.5f;
    float delta = target - opp_y;
    delta = std::fmax(-kOppSpeed, std::fmin(kOppSpeed, delta));
    opp_y = std::fmax(kPaddleHalf,
                      std::fmin(1.0f - kPaddleHalf, opp_y + delta));

    const bool serving = serve_timer > 0;
    const float old_vx = vx, old_vy = vy;
    bx += serving ? 0.0f : old_vx;
    by += serving ? 0.0f : old_vy;
    if (by < kBallR || by > 1.0f - kBallR) vy = -old_vy;
    by = std::fmax(kBallR, std::fmin(1.0f - kBallR, by));

    const bool cross_a =
        old_vx > 0 && bx >= kAgentX - kPaddleW && !serving &&
        std::fabs(by - agent_y) <= kPaddleHalf + kBallR;
    const bool cross_o =
        old_vx < 0 && bx <= kOppX + kPaddleW && !serving &&
        std::fabs(by - opp_y) <= kPaddleHalf + kBallR;
    if (cross_a) {
      vx = -std::fmin(std::fabs(old_vx) * 1.03f, 0.03f);
      vy = (by - agent_y) / kPaddleHalf * kBallVyMax;
      bx = kAgentX - kPaddleW - kBallR;
    } else if (cross_o) {
      vx = std::fmin(std::fabs(old_vx) * 1.03f, 0.03f);
      vy = (by - opp_y) / kPaddleHalf * kBallVyMax;
      bx = kOppX + kPaddleW + kBallR;
    }

    const bool agent_point = bx < 0.0f && !serving;
    const bool opp_point = bx > 1.0f && !serving;
    const float reward = (agent_point ? 1.0f : 0.0f) -
                         (opp_point ? 1.0f : 0.0f);
    score_a += agent_point;
    score_o += opp_point;
    serve_timer = serve_timer > 0 ? serve_timer - 1 : 0;
    if (agent_point || opp_point) serve(rng, /*toward_agent=*/opp_point);
    *done = score_a >= kWinScore || score_o >= kWinScore;
    return reward;
  }

  // grayscale render (≙ Pong.render: paddles 147, ball 236 on black)
  void render(uint8_t *f) const {
    std::memset(f, 0, kFrame);
    auto draw = [&](float cx, float cy, float hw, float hh, uint8_t v) {
      int x0 = (int)std::ceil((cx - hw) * (kW - 1));
      int x1 = (int)std::floor((cx + hw) * (kW - 1));
      int y0 = (int)std::ceil((cy - hh) * (kH - 1));
      int y1 = (int)std::floor((cy + hh) * (kH - 1));
      x0 = std::max(x0, 0); x1 = std::min(x1, kW - 1);
      y0 = std::max(y0, 0); y1 = std::min(y1, kH - 1);
      for (int y = y0; y <= y1; ++y)
        for (int x = x0; x <= x1; ++x)
          f[y * kW + x] = std::max(f[y * kW + x], v);
    };
    draw(kAgentX, agent_y, kPaddleW / 2 + 0.006f, kPaddleHalf, 147);
    draw(kOppX, opp_y, kPaddleW / 2 + 0.006f, kPaddleHalf, 147);
    if (serve_timer <= 0) draw(bx, by, kBallR, kBallR, 236);
  }

  // interleave the stack ring into channels-last [84, 84, 4] uint8
  void write_obs_u8(uint8_t *obs) const {
    for (int k = 0; k < kStack; ++k) {
      const uint8_t *p = planes[(start + k) % kStack];
      for (int i = 0; i < kFrame; ++i) obs[i * kStack + k] = p[i];
    }
  }

  void reset(std::mt19937 &rng, void *obs_v) override {
    std::uniform_real_distribution<float> dy(0.35f, 0.65f);
    bx = 0.5f; by = 0.5f; vx = kBallSpeedX; vy = 0.0f;
    agent_y = dy(rng); opp_y = 0.5f;
    score_a = score_o = 0; frame_count = 0;
    serve(rng, /*toward_agent=*/rng() & 1);
    render(planes[0]);
    for (int k = 1; k < kStack; ++k)
      std::memcpy(planes[k], planes[0], kFrame);
    start = 0;
    write_obs_u8(static_cast<uint8_t *>(obs_v));
  }

  void step(std::mt19937 &rng, int action, void *obs_v, void *final_obs_v,
            float *reward, uint8_t *terminated, uint8_t *truncated) override {
    float total_r = 0.0f;
    bool done = false;
    uint8_t f2[kFrame], f3[kFrame];
    for (int k = 0; k < kFrameSkip; ++k) {
      if (!done) {  // freeze dynamics once the episode ended mid-skip
        bool d = false;
        total_r += frame_step(rng, action, &d);
        done = done || d;
      }
      // only the last two substeps are rendered — the max-pool consumes
      // nothing else (≙ ALE screen grabs, env.rs:126-152)
      if (k == kFrameSkip - 2) render(f2);
      if (k == kFrameSkip - 1) render(f3);
    }
    for (int i = 0; i < kFrame; ++i) f2[i] = std::max(f2[i], f3[i]);
    // push the pooled frame into the ring (overwrite the oldest)
    std::memcpy(planes[start], f2, kFrame);
    start = (start + 1) % kStack;
    frame_count += kFrameSkip;

    const bool term = done;
    const bool trunc = !term && frame_count >= kMaxFrames;
    *terminated = term;
    *truncated = trunc;
    *reward = clip_reward
                  ? (total_r > 0 ? 1.0f : (total_r < 0 ? -1.0f : 0.0f))
                  : total_r;
    write_obs_u8(static_cast<uint8_t *>(final_obs_v));
    if (term || trunc) {
      reset(rng, obs_v);
    } else if (obs_v != final_obs_v) {
      std::memcpy(obs_v, final_obs_v, obs_bytes());
    }
  }
};


// 84×84 uint8 pixel Breakout — the host-native C++ twin of the on-device
// JAX game (border_tpu/envs/breakout.py: 6×18 brick wall with ALE row
// scores 7/7/4/4/1/1 top→bottom, 5 lives, FIRE-to-serve with auto-serve
// fallback, offset-angle paddle control).  Same preprocessing stack as
// PixelPong (frame-skip-4 + max-pool of the last two raw frames, 4-frame
// stack ring, 27k cap) and the reference's episodic-life TRAINING
// semantics: in train mode each life loss terminates the learning
// episode WITHOUT resetting the game (≙ BorderAtariEnv episodic life,
// border-atari-env/src/env.rs:263-299).
struct PixelBreakout final : EnvBase {
  static constexpr int kH = 84, kW = 84, kStack = 4;
  static constexpr int kFrame = kH * kW;
  static constexpr int kRows = 6, kCols = 18;
  static constexpr float kBandTop = 0.20f, kBrickH = 0.03f;
  static constexpr float kBandBot = kBandTop + kRows * kBrickH;
  static constexpr float kPaddleY = 0.93f, kPaddleHalf = 0.055f,
                         kPaddleSpeed = 0.03f, kBallR = 0.012f,
                         kBallSpeed = 0.017f;
  static constexpr int kLives = 5, kAutoServe = 45, kFrameSkip = 4;
  static constexpr int kMaxFrames = 27000;

  bool clip_reward;  // train mode: sign clip + episodic life
  bool bricks[kRows][kCols];
  float bx, by, vx, vy, px;
  int lives = kLives, idle = 0, frame_count = 0;
  bool launched = false;
  uint8_t planes[kStack][kFrame];
  int start = 0;

  explicit PixelBreakout(bool clip) : clip_reward(clip) {}

  int obs_dim() const override { return kFrame * kStack; }
  int obs_dtype() const override { return 1; }
  int num_actions() const override { return 4; }

  static float row_score(int r) {
    static const float s[kRows] = {7.f, 7.f, 4.f, 4.f, 1.f, 1.f};
    return s[r];
  }

  // one emulator frame (≙ Breakout.frame_step, envs/breakout.py);
  // accumulates a life-loss flag and sets *game_over
  float frame_step(std::mt19937 &rng, int a, bool *life_lost,
                   bool *game_over) {
    const float move = (a == 2 ? 1.0f : 0.0f) - (a == 3 ? 1.0f : 0.0f);
    px = std::fmax(kPaddleHalf,
                   std::fmin(1.0f - kPaddleHalf, px + move * kPaddleSpeed));

    // serve: FIRE or auto after kAutoServe idle frames
    const bool fire = a == 1 || idle >= kAutoServe;
    if (!launched && fire) {
      std::uniform_real_distribution<float> dang(-0.7f, 0.7f);
      const float ang = dang(rng);
      vx = kBallSpeed * std::sin(ang);
      vy = -kBallSpeed * std::cos(ang);
      launched = true;
    }
    idle = launched ? 0 : idle + 1;

    if (!launched) {  // ball rides the paddle
      bx = px;
      by = kPaddleY - 0.03f;
      return 0.0f;
    }
    bx += vx;
    by += vy;

    // wall bounces
    if (bx < kBallR || bx > 1.0f - kBallR) vx = -vx;
    bx = std::fmax(kBallR, std::fmin(1.0f - kBallR, bx));
    if (by < kBallR) vy = -vy;
    by = std::fmax(by, kBallR);

    // paddle bounce with offset-angle control
    if (vy > 0 && by >= kPaddleY - kBallR && by <= kPaddleY + 0.02f &&
        std::fabs(bx - px) <= kPaddleHalf + kBallR) {
      const float offset =
          std::fmax(-1.0f, std::fmin(1.0f, (bx - px) / kPaddleHalf));
      vx = kBallSpeed * offset * 0.9f;
      vy = -std::fabs(vy);
    }

    // brick collision: cell under the ball → clear + bounce + row score
    float reward = 0.0f;
    if (by >= kBandTop && by < kBandBot) {
      int row = (int)((by - kBandTop) / kBrickH);
      row = std::max(0, std::min(kRows - 1, row));
      int col = (int)(bx * kCols);
      col = std::max(0, std::min(kCols - 1, col));
      if (bricks[row][col]) {
        bricks[row][col] = false;
        reward = row_score(row);
        vy = -vy;
      }
    }

    // life loss: ball below the paddle line
    if (by > 1.0f - kBallR) {
      --lives;
      *life_lost = true;
      launched = false;
      bx = px;
      by = kPaddleY - 0.03f;
      vx = vy = 0.0f;
    }

    bool cleared = true;
    for (int r = 0; r < kRows && cleared; ++r)
      for (int c = 0; c < kCols; ++c)
        if (bricks[r][c]) { cleared = false; break; }
    *game_over = lives <= 0 || cleared;
    return reward;
  }

  // grayscale render (≙ Breakout.render: bricks 110, paddle 147, ball 236)
  void render(uint8_t *f) const {
    std::memset(f, 0, kFrame);
    // brick band
    for (int y = 0; y < kH; ++y) {
      const float yf = (float)y / (kH - 1);
      if (yf < kBandTop || yf >= kBandBot) continue;
      int row = (int)((yf - kBandTop) / kBrickH);
      row = std::max(0, std::min(kRows - 1, row));
      for (int x = 0; x < kW; ++x) {
        int col = (int)((float)x / (kW - 1) * kCols);
        col = std::max(0, std::min(kCols - 1, col));
        if (bricks[row][col]) f[y * kW + x] = 110;
      }
    }
    auto draw = [&](float cx, float cy, float hw, float hh, uint8_t v) {
      int x0 = (int)std::ceil((cx - hw) * (kW - 1));
      int x1 = (int)std::floor((cx + hw) * (kW - 1));
      int y0 = (int)std::ceil((cy - hh) * (kH - 1));
      int y1 = (int)std::floor((cy + hh) * (kH - 1));
      x0 = std::max(x0, 0); x1 = std::min(x1, kW - 1);
      y0 = std::max(y0, 0); y1 = std::min(y1, kH - 1);
      for (int y = y0; y <= y1; ++y)
        for (int x = x0; x <= x1; ++x)
          f[y * kW + x] = std::max(f[y * kW + x], v);
    };
    draw(px, kPaddleY, kPaddleHalf, 0.012f, 147);
    if (launched) draw(bx, by, kBallR, kBallR, 236);
  }

  void write_obs_u8(uint8_t *obs) const {
    for (int k = 0; k < kStack; ++k) {
      const uint8_t *p = planes[(start + k) % kStack];
      for (int i = 0; i < kFrame; ++i) obs[i * kStack + k] = p[i];
    }
  }

  void reset(std::mt19937 &rng, void *obs_v) override {
    std::uniform_real_distribution<float> dx(0.3f, 0.7f);
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) bricks[r][c] = true;
    px = dx(rng);
    bx = dx(rng);
    by = kPaddleY - 0.05f;
    vx = vy = 0.0f;
    lives = kLives;
    launched = false;
    idle = 0;
    frame_count = 0;
    render(planes[0]);
    for (int k = 1; k < kStack; ++k)
      std::memcpy(planes[k], planes[0], kFrame);
    start = 0;
    write_obs_u8(static_cast<uint8_t *>(obs_v));
  }

  void step(std::mt19937 &rng, int action, void *obs_v, void *final_obs_v,
            float *reward, uint8_t *terminated, uint8_t *truncated) override {
    float total_r = 0.0f;
    bool life_lost = false, game_over = false;
    uint8_t f2[kFrame], f3[kFrame];
    for (int k = 0; k < kFrameSkip; ++k) {
      if (!game_over)
        total_r += frame_step(rng, action, &life_lost, &game_over);
      if (k == kFrameSkip - 2) render(f2);
      if (k == kFrameSkip - 1) render(f3);
    }
    for (int i = 0; i < kFrame; ++i) f2[i] = std::max(f2[i], f3[i]);
    std::memcpy(planes[start], f2, kFrame);
    start = (start + 1) % kStack;
    frame_count += kFrameSkip;

    // train mode: each life loss ends the LEARNING episode; the game
    // itself continues (episodic life).  eval mode: full games only.
    const bool term = clip_reward ? (life_lost || game_over) : game_over;
    const bool trunc = !term && frame_count >= kMaxFrames;
    *terminated = term;
    *truncated = trunc;
    *reward = clip_reward
                  ? (total_r > 0 ? 1.0f : (total_r < 0 ? -1.0f : 0.0f))
                  : total_r;
    write_obs_u8(static_cast<uint8_t *>(final_obs_v));
    if (game_over || trunc) {
      reset(rng, obs_v);
    } else if (obs_v != final_obs_v) {
      // episodic-life termination (or plain step): next obs continues
      // the running game
      std::memcpy(obs_v, final_obs_v, obs_bytes());
    }
  }
};

EnvBase *make_env(int env_id) {
  switch (env_id) {
    case 0: return new CartPole();
    case 1: return new Pendulum();
    case 2: return new PixelPong(/*clip=*/true);   // train mode
    case 3: return new PixelPong(/*clip=*/false);  // eval mode
    case 4: return new PixelBreakout(/*clip=*/true);   // train mode
    case 5: return new PixelBreakout(/*clip=*/false);  // eval mode
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
  int num_envs = 0, obs_dim = 0, obs_bytes = 0, obs_dtype = 0, n_threads = 0;

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
    obs_bytes = envs[0]->obs_bytes();
    obs_dtype = envs[0]->obs_dtype();
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

// 0 = float32, 1 = uint8 (pixel envs)
int envpool_obs_dtype(void *h) { return static_cast<Pool *>(h)->obs_dtype; }

int envpool_num_actions(void *h) {
  return static_cast<Pool *>(h)->envs[0]->num_actions();
}

void envpool_reset(void *h, void *obs_out) {
  Pool *p = static_cast<Pool *>(h);
  const int b = p->obs_bytes;
  uint8_t *obs = static_cast<uint8_t *>(obs_out);
  p->run([=](int i) { p->envs[i]->reset(p->rngs[i], obs + (size_t)i * b); });
}

void envpool_step(void *h, const int32_t *actions, void *obs_out,
                  float *reward_out, uint8_t *term_out, uint8_t *trunc_out) {
  Pool *p = static_cast<Pool *>(h);
  const int b = p->obs_bytes;
  uint8_t *obs = static_cast<uint8_t *>(obs_out);
  p->run([=](int i) {
    // final_obs aliases obs: plain auto-reset semantics (back-compat ABI)
    p->envs[i]->step(p->rngs[i], actions[i], obs + (size_t)i * b,
                     obs + (size_t)i * b, reward_out + i, term_out + i,
                     trunc_out + i);
  });
}

// step + separate pre-reset (final) obs — what replay transitions need as
// next_obs at episode boundaries.
void envpool_step2(void *h, const int32_t *actions, void *obs_out,
                   void *final_obs_out, float *reward_out, uint8_t *term_out,
                   uint8_t *trunc_out) {
  Pool *p = static_cast<Pool *>(h);
  const int b = p->obs_bytes;
  uint8_t *obs = static_cast<uint8_t *>(obs_out);
  uint8_t *fobs = static_cast<uint8_t *>(final_obs_out);
  p->run([=](int i) {
    p->envs[i]->step(p->rngs[i], actions[i], obs + (size_t)i * b,
                     fobs + (size_t)i * b, reward_out + i, term_out + i,
                     trunc_out + i);
  });
}

void envpool_destroy(void *h) { delete static_cast<Pool *>(h); }

}  // extern "C"
