// Batched environment farm implementation. See dz_env.h.
//
// Games mirror the rules of the JAX implementations
// (dqn_zoo_tpu/envs/games/*.py) but render DIRECTLY into the 84x84
// grayscale observation (the JAX backend is the full-fidelity
// 210x160-RGB-through-preprocessing parity path; this host backend trades
// that for memory traffic — ~14 KB per env-step instead of ~800 KB).

#include "dz_env.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstring>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kObs = 84;
constexpr float kSy = 84.0f / 210.0f;  // world->obs scale (y)
constexpr float kSx = 84.0f / 160.0f;  // world->obs scale (x)

struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ^ 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s += 0x9e3779b97f4a7c15ull;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }
  float uniform(float lo, float hi) {
    return lo + (hi - lo) * float(next() >> 40) / float(1 << 24);
  }
  int randint(int lo, int hi) {  // [lo, hi)
    return lo + int(next() % uint64_t(hi - lo));
  }
  bool bernoulli() { return next() & 1; }
};

// Draws a filled rect given WORLD coordinates (210x160 space) into an 84x84
// luma buffer.
void draw_rect(uint8_t* obs, float y0, float y1, float x0, float x1,
               uint8_t value) {
  int oy0 = std::max(0, int(y0 * kSy));
  int oy1 = std::min(kObs, int(std::ceil(y1 * kSy)));
  int ox0 = std::max(0, int(x0 * kSx));
  int ox1 = std::min(kObs, int(std::ceil(x1 * kSx)));
  for (int y = oy0; y < oy1; ++y) {
    uint8_t* row = obs + y * kObs;
    for (int x = ox0; x < ox1; ++x) row[x] = std::max(row[x], value);
  }
}

class Game {
 public:
  virtual ~Game() = default;
  virtual void reset(Rng& rng) = 0;
  // One raw frame. Returns reward; sets done/life_lost.
  virtual float step(int action, Rng& rng, bool* done, bool* life_lost) = 0;
  virtual void render(uint8_t* obs84) const = 0;  // paints onto zeroed buf
  virtual int lives() const { return 1; }
  virtual int num_actions() const = 0;
};

// ---------------------------------------------------------------- pong ----
class Pong : public Game {
 public:
  int num_actions() const override { return 6; }

  void reset(Rng& rng) override {
    player_y_ = enemy_y_ = (34 + 194) / 2.0f - 8.0f;
    ball_x_ = 80.0f;
    ball_y_ = rng.uniform(54.0f, 170.0f);
    serve(rng, rng.bernoulli());
    p_score_ = e_score_ = 0;
    serve_delay_ = rng.randint(2, 12);
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    bool up = action == 2 || action == 4;
    bool down = action == 3 || action == 5;
    player_y_ += up ? -4.0f : (down ? 4.0f : 0.0f);
    player_y_ = std::clamp(player_y_, 34.0f, 194.0f - 16.0f);

    float target = ball_y_ - 8.0f;
    float diff = target - enemy_y_;
    float edy = std::clamp(diff, -3.0f, 3.0f);
    if (std::fabs(diff) < 2.0f) edy = 0.0f;
    enemy_y_ = std::clamp(enemy_y_ + edy, 34.0f, 194.0f - 16.0f);

    if (serve_delay_ > 0) {
      --serve_delay_;
    } else {
      ball_x_ += vx_;
      ball_y_ += vy_;
    }
    if (ball_y_ < 34.0f || ball_y_ > 190.0f) {
      vy_ = -vy_;
      ball_y_ = std::clamp(ball_y_, 34.0f, 190.0f);
    }
    // player paddle (x=140)
    if (vx_ > 0 && ball_x_ + 4 >= 140 && ball_x_ <= 144 &&
        ball_y_ + 4 >= player_y_ && ball_y_ <= player_y_ + 16) {
      float off = (ball_y_ + 2 - (player_y_ + 8)) / 8.0f;
      vy_ = std::clamp(vy_ + 2.0f * off, -4.0f, 4.0f);
      vx_ = -std::min(std::fabs(vx_) + 0.15f, 5.0f);
      ball_x_ = 136.0f;
    }
    // enemy paddle (x=16)
    if (vx_ < 0 && ball_x_ <= 20 && ball_x_ + 4 >= 16 &&
        ball_y_ + 4 >= enemy_y_ && ball_y_ <= enemy_y_ + 16) {
      float off = (ball_y_ + 2 - (enemy_y_ + 8)) / 8.0f;
      vy_ = std::clamp(vy_ + 2.0f * off, -4.0f, 4.0f);
      vx_ = std::min(std::fabs(vx_) + 0.15f, 5.0f);
      ball_x_ = 20.0f;
    }
    float reward = 0.0f;
    if (ball_x_ < 0) {
      reward = 1.0f;
      ++p_score_;
      respawn(rng, false);
    } else if (ball_x_ > 156) {
      reward = -1.0f;
      ++e_score_;
      respawn(rng, true);
    }
    *done = p_score_ >= 21 || e_score_ >= 21;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 24, 34, 0, 160, 120);
    draw_rect(o, 194, 200, 0, 160, 120);
    draw_rect(o, enemy_y_, enemy_y_ + 16, 16, 20, 140);
    draw_rect(o, player_y_, player_y_ + 16, 140, 144, 150);
    draw_rect(o, ball_y_, ball_y_ + 4, ball_x_, ball_x_ + 4, 236);
  }

 private:
  void serve(Rng& rng, bool toward_player) {
    vx_ = toward_player ? 3.0f : -3.0f;
    vy_ = rng.uniform(-2.0f, 2.0f);
  }
  void respawn(Rng& rng, bool toward_player) {
    ball_x_ = 80.0f;
    ball_y_ = 114.0f;
    serve(rng, toward_player);
    serve_delay_ = 30;
  }
  float player_y_, enemy_y_, ball_x_, ball_y_, vx_, vy_;
  int p_score_, e_score_, serve_delay_;
};

// ------------------------------------------------------------ breakout ----
class Breakout : public Game {
 public:
  int num_actions() const override { return 4; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    paddle_x_ = rng.uniform(8.0f, 136.0f);
    std::fill(bricks_, bricks_ + 108, true);
    lives_ = 5;
    ball_dead_ = true;
    serve_delay_ = 0;
    ball_x_ = 80;
    ball_y_ = 120;
    vx_ = 1.5f;
    vy_ = -3.0f;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    *done = false;
    if (action == 2) paddle_x_ += 6.0f;
    if (action == 3) paddle_x_ -= 6.0f;
    paddle_x_ = std::clamp(paddle_x_, 8.0f, 136.0f);

    if (ball_dead_) {
      ++serve_delay_;
      if (action == 1 || serve_delay_ > 120) {
        // ALE-calibrated serve (matches games/breakout.py): random column
        // just below the brick band, moving DOWN — random play lands near
        // the cartridge's 1.7 anchor instead of farming brick points.
        ball_dead_ = false;
        ball_x_ = rng.uniform(12.0f, 146.0f);
        ball_y_ = 97.0f;
        vx_ = rng.bernoulli() ? 1.5f : -1.5f;
        vy_ = 3.0f;
        serve_delay_ = 0;
      }
      return 0.0f;
    }
    ball_x_ += vx_;
    ball_y_ += vy_;
    if (ball_x_ < 8 || ball_x_ > 150) {
      vx_ = -vx_;
      ball_x_ = std::clamp(ball_x_, 8.0f, 150.0f);
    }
    if (ball_y_ < 32) {
      vy_ = -vy_;
      ball_y_ = 32;
    }
    float reward = 0.0f;
    int col = int((ball_x_ + 1 - 8) / 8.0f);
    int row = int((ball_y_ + 1 - 57) / 6.0f);
    if (row >= 0 && row < 6 && col >= 0 && col < 18 &&
        bricks_[row * 18 + col]) {
      bricks_[row * 18 + col] = false;
      vy_ = -vy_;
      static const float kPoints[6] = {7, 7, 4, 4, 1, 1};
      reward = kPoints[row];
      bool any = false;
      for (bool b : bricks_) any |= b;
      if (!any) std::fill(bricks_, bricks_ + 108, true);
    }
    if (vy_ > 0 && ball_y_ + 2 >= 189 && ball_y_ <= 193 &&
        ball_x_ + 2 >= paddle_x_ && ball_x_ <= paddle_x_ + 16) {
      float off = (ball_x_ + 1 - (paddle_x_ + 8)) / 8.0f;
      vx_ = std::clamp(vx_ + 2.0f * off, -4.0f, 4.0f);
      vy_ = -std::fabs(vy_) - 0.02f;
      ball_y_ = 187.0f;
    }
    if (ball_y_ > 205) {
      --lives_;
      ball_dead_ = true;
      if (lives_ <= 0) {
        *done = true;
      } else {
        *life_lost = true;
      }
    }
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 17, 32, 0, 160, 120);
    draw_rect(o, 32, 196, 0, 8, 120);
    draw_rect(o, 32, 196, 152, 160, 120);
    for (int r = 0; r < 6; ++r)
      for (int c = 0; c < 18; ++c)
        if (bricks_[r * 18 + c])
          draw_rect(o, 57 + r * 6, 63 + r * 6, 8 + c * 8, 16 + c * 8,
                    uint8_t(200 - r * 15));
    draw_rect(o, 189, 193, paddle_x_, paddle_x_ + 16, 180);
    if (!ball_dead_) draw_rect(o, ball_y_, ball_y_ + 2, ball_x_, ball_x_ + 2,
                               236);
  }

 private:
  float paddle_x_, ball_x_, ball_y_, vx_, vy_;
  bool bricks_[108];
  int lives_, serve_delay_;
  bool ball_dead_;
};

// --------------------------------------------------------------- catch ----
class Catch : public Game {
 public:
  int num_actions() const override { return 3; }

  void reset(Rng& rng) override {
    ball_col_ = rng.randint(0, 5);
    paddle_pos_ = float(rng.randint(0, 5));
    ball_y_ = 20.0f;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    // 0.25 columns per raw frame = 1 column per action-repeat-4 agent step
    // (whole-column moves per frame made only edge columns reachable).
    if (action == 1) paddle_pos_ = std::max(0.0f, paddle_pos_ - 0.25f);
    if (action == 2) paddle_pos_ = std::min(4.0f, paddle_pos_ + 0.25f);
    ball_y_ += 2.0f;
    *done = ball_y_ >= 190.0f;
    if (*done)
      return int(std::lround(paddle_pos_)) == ball_col_ ? 1.0f : -1.0f;
    return 0.0f;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, ball_y_, ball_y_ + 16, ball_col_ * 32 + 8,
              ball_col_ * 32 + 24, 236);
    draw_rect(o, 190, 198, paddle_pos_ * 32, paddle_pos_ * 32 + 32, 150);
  }

 private:
  int ball_col_;
  float paddle_pos_, ball_y_;
};

// ------------------------------------------------------ space invaders ----
class SpaceInvaders : public Game {
 public:
  int num_actions() const override { return 6; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    player_x_ = rng.uniform(8.0f, 144.0f);
    std::fill(aliens_, aliens_ + 36, true);
    grid_x_ = 26.0f;
    grid_y_ = 52.0f;
    dir_ = 1.0f;
    shot_live_ = false;
    for (int i = 0; i < 3; ++i) bomb_live_[i] = false;
    lives_ = 3;
    wave_ = 0;
    respawn_delay_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    bool right = action == 2 || action == 4;
    bool left = action == 3 || action == 5;
    bool fire = action == 1 || action == 4 || action == 5;
    player_x_ += right ? 2.0f : (left ? -2.0f : 0.0f);
    player_x_ = std::clamp(player_x_, 8.0f, 144.0f);

    // March: speed grows as the wave thins and across waves.
    int alive = 0;
    for (bool a : aliens_) alive += a;
    float speed = 0.25f + 0.9f * (1.0f - alive / 36.0f) + 0.1f * wave_;
    float gx = grid_x_ + dir_ * speed;
    int lo_col = 5, hi_col = 0;
    for (int c = 0; c < 6; ++c)
      for (int r = 0; r < 6; ++r)
        if (aliens_[r * 6 + c]) {
          lo_col = std::min(lo_col, c);
          hi_col = std::max(hi_col, c);
        }
    if (gx + lo_col * 16 < 8.0f || gx + hi_col * 16 + 8 > 152.0f) {
      dir_ = -dir_;
      grid_y_ += 8.0f;
    } else {
      grid_x_ = gx;
    }

    if (fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = player_x_ + 4.0f;
      shot_y_ = 183.0f;
    }
    float reward = 0.0f;
    if (shot_live_) {
      shot_y_ -= 6.0f;
      if (shot_y_ <= 34.0f) shot_live_ = false;
      int col = int(std::floor((shot_x_ - grid_x_) / 16.0f));
      int row = int(std::floor((shot_y_ - grid_y_) / 14.0f));
      float in_x = shot_x_ - grid_x_ - col * 16.0f;
      float in_y = shot_y_ - grid_y_ - row * 14.0f;
      if (row >= 0 && row < 6 && col >= 0 && col < 6 && in_x < 10.0f &&
          in_y < 8.0f && aliens_[row * 6 + col]) {
        aliens_[row * 6 + col] = false;
        shot_live_ = false;
        static const float kPoints[6] = {30, 25, 20, 15, 10, 5};
        reward = kPoints[row];
      }
    }

    // Bombs drop from the lowest live alien of a random column. Matches the
    // JAX step's structure (games/space_invaders.py:131-148): column and
    // spawn draws happen for EVERY slot every frame, and a just-spawned bomb
    // falls on its spawn frame.
    for (int i = 0; i < 3; ++i) {
      int c = rng.randint(0, 6);
      float u = rng.uniform(0.0f, 1.0f);
      if (!bomb_live_[i]) {
        int low = -1;
        for (int r = 0; r < 6; ++r)
          if (aliens_[r * 6 + c]) low = r;
        if (low >= 0 && u < 0.02f) {
          bomb_live_[i] = true;
          bomb_x_[i] = grid_x_ + c * 16.0f + 4.0f;
          bomb_y_[i] = grid_y_ + (low + 1) * 14.0f;
        }
      }
      if (bomb_live_[i]) {
        bomb_y_[i] += 2.5f;
        if (bomb_y_[i] >= 200.0f) bomb_live_[i] = false;
      }
    }
    // Vulnerability is checked against the PRE-decrement delay, like the JAX
    // step (games/space_invaders.py:151-152): a fresh hit gives exactly
    // RESPAWN_FRAMES invulnerable frames.
    bool vulnerable = respawn_delay_ <= 0;
    if (respawn_delay_ > 0) --respawn_delay_;
    bool overlap = false;
    for (int i = 0; i < 3; ++i)
      if (bomb_live_[i] && bomb_x_[i] + 2 >= player_x_ &&
          bomb_x_[i] <= player_x_ + 8 && bomb_y_[i] + 6 >= 185.0f &&
          bomb_y_[i] <= 193.0f)
        overlap = true;
    bool player_hit = overlap && vulnerable;
    if (player_hit) {
      --lives_;
      respawn_delay_ = 30;
      for (int i = 0; i < 3; ++i) bomb_live_[i] = false;
    }

    bool any = false;
    for (bool a : aliens_) any |= a;
    if (!any) {  // wave cleared: respawn lower and faster
      std::fill(aliens_, aliens_ + 36, true);
      ++wave_;
      grid_x_ = 26.0f;
      grid_y_ = std::min(52.0f + 8.0f * wave_, 90.0f);
    }
    int low_row = 0;
    for (int r = 0; r < 6; ++r)
      for (int c = 0; c < 6; ++c)
        if (aliens_[r * 6 + c]) low_row = std::max(low_row, r);
    bool invaded = grid_y_ + low_row * 14.0f + 8.0f >= 185.0f;
    *done = lives_ <= 0 || invaded;
    *life_lost = player_hit && !*done;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 195, 197, 0, 160, 120);
    for (int r = 0; r < 6; ++r)
      for (int c = 0; c < 6; ++c)
        if (aliens_[r * 6 + c])
          draw_rect(o, grid_y_ + r * 14, grid_y_ + r * 14 + 8,
                    grid_x_ + c * 16, grid_x_ + c * 16 + 8, 180);
    for (int i = 0; i < 3; ++i)
      if (bomb_live_[i])
        draw_rect(o, bomb_y_[i], bomb_y_[i] + 6, bomb_x_[i], bomb_x_[i] + 2,
                  200);
    if (shot_live_)
      draw_rect(o, shot_y_, shot_y_ + 6, shot_x_, shot_x_ + 2, 236);
    draw_rect(o, 185, 193, player_x_, player_x_ + 8, 150);
  }

 private:
  float player_x_, grid_x_, grid_y_, dir_, shot_x_, shot_y_;
  float bomb_x_[3], bomb_y_[3];
  bool aliens_[36], shot_live_, bomb_live_[3];
  int lives_, wave_, respawn_delay_;
};

// ------------------------------------------------------------- freeway ----
class Freeway : public Game {
 public:
  int num_actions() const override { return 3; }

  void reset(Rng& rng) override {
    chicken_y_ = 186.0f;
    for (int i = 0; i < 10; ++i) car_x_[i] = rng.uniform(0.0f, 160.0f);
    frame_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    if (action == 1) chicken_y_ -= 2.0f;
    if (action == 2) chicken_y_ += 2.0f;
    chicken_y_ = std::clamp(chicken_y_, 18.0f, 186.0f);

    static const float kSpeeds[10] = {1.2f, 2.0f, 1.5f, 2.5f, 1.8f,
                                      1.8f, 2.5f, 1.5f, 2.0f, 1.2f};
    // Single any-hit knockback per frame, like the JAX step
    // (games/freeway.py:79-80) — never one knockback per colliding lane.
    bool hit = false;
    for (int i = 0; i < 10; ++i) {
      float d = i < 5 ? 1.0f : -1.0f;
      car_x_[i] = std::fmod(car_x_[i] + d * kSpeeds[i] + 160.0f, 160.0f);
      float lane_y = 24.0f + i * 16.0f + 3.0f;
      bool oy = chicken_y_ + 8 >= lane_y && chicken_y_ <= lane_y + 10;
      bool ox = car_x_[i] <= 50.0f && car_x_[i] + 16 >= 44.0f;
      hit = hit || (oy && ox);
    }
    if (hit) chicken_y_ = std::min(chicken_y_ + 24.0f, 186.0f);
    float reward = 0.0f;
    if (chicken_y_ <= 20.0f) {
      reward = 1.0f;
      chicken_y_ = 186.0f;
    }
    ++frame_;
    *done = frame_ >= 8160;  // 2:16 at 60 Hz — the ALE game clock
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 0, 24, 0, 160, 90);
    draw_rect(o, 184, 210, 0, 160, 90);
    for (int i = 0; i < 10; ++i)
      draw_rect(o, 24.0f + i * 16 + 3, 24.0f + i * 16 + 13, car_x_[i],
                car_x_[i] + 16, 170);
    draw_rect(o, chicken_y_, chicken_y_ + 8, 44, 50, 236);
  }

 private:
  float chicken_y_, car_x_[10];
  int frame_;
};

// ------------------------------------------------------------ seaquest ----
class Seaquest : public Game {
 public:
  int num_actions() const override { return 18; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    px_ = 72.0f;
    py_ = 46.0f;
    facing_ = 1.0f;
    torp_live_ = false;
    for (int i = 0; i < 4; ++i) {
      enemy_x_[i] = rng.uniform(8.0f, 140.0f);
      enemy_live_[i] = true;
      enemy_respawn_[i] = 0;
      diver_live_[i] = rng.uniform(0.0f, 1.0f) < 0.25f;
      diver_x_[i] = 0.0f;
    }
    divers_ = 0;
    oxygen_ = 360.0f;
    was_surfaced_ = true;
    lives_ = 4;
    level_ = 0;
    invuln_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    // Full 18-action set: same movement tables as the JAX step
    // (games/seaquest.py:_DX/_DY).
    static const int kDx[18] = {0, 0, 0, 1, -1, 0, 1, -1, 1,
                                -1, 0, 1, -1, 0, 1, -1, 1, -1};
    static const int kDy[18] = {0, 0, -1, 0, 0, 1, -1, -1, 1,
                                1, -1, 0, 0, 1, -1, -1, 1, 1};
    bool fire = action == 1 || action >= 10;
    px_ = std::clamp(px_ + 2.0f * kDx[action], 8.0f, 152.0f - 16.0f);
    py_ = std::clamp(py_ + 2.0f * kDy[action], 46.0f, 180.0f);
    if (kDx[action] != 0) facing_ = kDx[action] > 0 ? 1.0f : -1.0f;
    bool surfaced = py_ <= 50.0f;
    float reward = 0.0f;

    static const float kLaneY[4] = {80.0f, 110.0f, 140.0f, 170.0f};
    static const float kLaneDir[4] = {1.0f, -1.0f, 1.0f, -1.0f};
    float speed = 1.0f + 0.3f * level_;
    for (int i = 0; i < 4; ++i) {
      if (enemy_live_[i]) {
        enemy_x_[i] += kLaneDir[i] * speed;
        if (enemy_x_[i] < -12.0f || enemy_x_[i] > 160.0f)
          enemy_x_[i] = kLaneDir[i] > 0 ? -12.0f : 160.0f;
      } else if (--enemy_respawn_[i] <= 0) {
        enemy_respawn_[i] = 0;
        enemy_live_[i] = true;
        enemy_x_[i] = kLaneDir[i] > 0 ? -12.0f : 160.0f;
      }
      // Divers drift opposite, slower; idle lanes respawn stochastically.
      // Draw order matches the JAX step: one uniform per lane per frame.
      float u = rng.uniform(0.0f, 1.0f);
      if (diver_live_[i]) {
        diver_x_[i] -= kLaneDir[i] * 0.5f;
        if (diver_x_[i] < -8.0f || diver_x_[i] > 160.0f)
          diver_live_[i] = false;
      } else if (u < 0.008f) {
        diver_live_[i] = true;
        diver_x_[i] = kLaneDir[i] > 0 ? 160.0f : -8.0f;
      }
    }

    if (fire && !torp_live_ && !surfaced) {
      torp_live_ = true;
      torp_x_ = px_ + (facing_ > 0 ? 16.0f : -6.0f);
      torp_y_ = py_ + 4.0f;
      torp_dir_ = facing_;
    }
    if (torp_live_) {
      torp_x_ += torp_dir_ * 4.0f;
      if (torp_x_ < -6.0f || torp_x_ > 160.0f) torp_live_ = false;
    }
    for (int i = 0; i < 4 && torp_live_; ++i) {
      bool band = torp_y_ + 2.0f >= kLaneY[i] && torp_y_ <= kLaneY[i] + 7.0f;
      bool over = torp_x_ + 6.0f >= enemy_x_[i] &&
                  torp_x_ <= enemy_x_[i] + 12.0f;
      if (enemy_live_[i] && band && over) {
        enemy_live_[i] = false;
        enemy_respawn_[i] = 40;
        torp_live_ = false;
        reward += 20.0f;
      }
    }

    for (int i = 0; i < 4; ++i) {
      bool band = py_ + 8.0f >= kLaneY[i] && py_ <= kLaneY[i] + 7.0f;
      bool over = px_ + 16.0f >= diver_x_[i] && px_ <= diver_x_[i] + 8.0f;
      if (diver_live_[i] && band && over && divers_ < 6) {
        diver_live_[i] = false;
        ++divers_;
      }
    }

    bool vulnerable = invuln_ <= 0;
    bool collided = false;
    for (int i = 0; i < 4; ++i) {
      bool band = py_ + 8.0f >= kLaneY[i] && py_ <= kLaneY[i] + 7.0f;
      bool over = px_ + 16.0f >= enemy_x_[i] && px_ <= enemy_x_[i] + 12.0f;
      collided |= enemy_live_[i] && band && over;
    }
    collided = collided && vulnerable && !surfaced;

    oxygen_ = surfaced ? std::min(oxygen_ + 8.0f, 360.0f) : oxygen_ - 1.0f;
    bool suffocated = oxygen_ <= 0.0f;

    bool just_surfaced = surfaced && !was_surfaced_;
    bool cash_in = just_surfaced && divers_ == 6;
    bool drop_one = just_surfaced && divers_ > 0 && !cash_in;
    bool bad_surface = just_surfaced && divers_ == 0 && vulnerable;
    if (cash_in) {
      reward += 50.0f * 6;
      divers_ = 0;
      ++level_;
    } else if (drop_one) {
      --divers_;
    }

    bool lost = collided || suffocated || bad_surface;
    if (lost) {
      --lives_;
      px_ = 72.0f;
      py_ = 46.0f;
      oxygen_ = 360.0f;
      surfaced = true;
      invuln_ = 30;
      torp_live_ = false;
    } else if (invuln_ > 0) {
      --invuln_;
    }
    was_surfaced_ = surfaced;
    *done = lives_ <= 0;
    *life_lost = lost && !*done;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 46, 193, 0, 160, 40);   // water
    draw_rect(o, 193, 210, 0, 160, 170);  // sea floor
    draw_rect(o, 198, 203, 49, 49.0f + 60.0f * oxygen_ / 360.0f, 214);
    static const float kLaneY[4] = {80.0f, 110.0f, 140.0f, 170.0f};
    for (int i = 0; i < 4; ++i) {
      if (enemy_live_[i])
        draw_rect(o, kLaneY[i], kLaneY[i] + 7, enemy_x_[i],
                  enemy_x_[i] + 12, 150);
      if (diver_live_[i])
        draw_rect(o, kLaneY[i], kLaneY[i] + 7, diver_x_[i], diver_x_[i] + 8,
                  90);
    }
    for (int i = 0; i < divers_; ++i)
      draw_rect(o, 198, 203, 120.0f + 6 * i, 124.0f + 6 * i, 60);
    if (torp_live_)
      draw_rect(o, torp_y_, torp_y_ + 2, torp_x_, torp_x_ + 6, 236);
    draw_rect(o, py_, py_ + 8, px_, px_ + 16, 200);
  }

 private:
  float px_, py_, facing_, torp_x_, torp_y_, torp_dir_, oxygen_;
  float enemy_x_[4], diver_x_[4];
  bool torp_live_, was_surfaced_, enemy_live_[4], diver_live_[4];
  int enemy_respawn_[4], divers_, lives_, level_, invuln_;
};

// ------------------------------------------------------------- asterix ----
// Mirrors games/asterix.py: 8 lanes of drifting collectibles/lyres, 9-action
// 8-direction movement, +50 per collect, lyre costs a life (3 lives).
class Asterix : public Game {
 public:
  int num_actions() const override { return 9; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    px_ = 76.0f;
    py_ = 30.0f + 4 * 18.0f + 4.0f;
    for (int i = 0; i < 8; ++i) {
      obj_x_[i] = rng.uniform(12.0f, 140.0f);
      obj_live_[i] = true;
      obj_lyre_[i] = rng.uniform(0.0f, 1.0f) < 0.25f;
    }
    score_ = 0.0f;
    lives_ = 3;
    respawn_delay_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    bool up = action == 1 || action == 5 || action == 6;
    bool dn = action == 4 || action == 7 || action == 8;
    bool rt = action == 2 || action == 5 || action == 7;
    bool lf = action == 3 || action == 6 || action == 8;
    px_ = std::clamp(px_ + (rt ? 2.0f : 0.0f) - (lf ? 2.0f : 0.0f), 12.0f,
                     152.0f - 8.0f);
    py_ = std::clamp(py_ + (dn ? 2.0f : 0.0f) - (up ? 2.0f : 0.0f), 30.0f,
                     174.0f - 10.0f);

    float speed = std::min(1.0f + 2e-4f * score_, 3.0f);
    bool collected_any = false, lyre_hit = false;
    for (int i = 0; i < 8; ++i) {
      float d = (i % 2 == 0) ? 1.0f : -1.0f;
      obj_x_[i] += d * speed;
      if (obj_x_[i] < -8.0f || obj_x_[i] > 160.0f) obj_live_[i] = false;
      if (!obj_live_[i] && rng.uniform(0.0f, 1.0f) < 0.03f) {
        obj_x_[i] = d > 0 ? -7.0f : 159.0f;
        obj_lyre_[i] = rng.uniform(0.0f, 1.0f) < 0.25f;
        obj_live_[i] = true;
      }
      float lane_y = 30.0f + i * 18.0f + 5.0f;
      bool oy = py_ + 10 >= lane_y && py_ <= lane_y + 8;
      bool ox = obj_x_[i] <= px_ + 8 && obj_x_[i] + 8 >= px_;
      if (obj_live_[i] && oy && ox) {
        if (obj_lyre_[i]) {
          lyre_hit = true;
        } else {
          collected_any = true;
          obj_live_[i] = false;
        }
      }
    }
    float reward = collected_any ? 50.0f : 0.0f;
    score_ += reward;
    bool vulnerable = respawn_delay_ <= 0;
    respawn_delay_ = std::max(respawn_delay_ - 1, 0);
    if (lyre_hit && vulnerable) {
      --lives_;
      respawn_delay_ = 45;
      for (int i = 0; i < 8; ++i) obj_live_[i] = false;  // wave reset
    }
    *done = lives_ <= 0;
    *life_lost = lyre_hit && vulnerable && !*done;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 0, 30, 0, 160, 60);
    draw_rect(o, 174, 210, 0, 160, 60);
    for (int i = 0; i < 8; ++i) {
      if (!obj_live_[i]) continue;
      float lane_y = 30.0f + i * 18.0f + 5.0f;
      draw_rect(o, lane_y, lane_y + 8, obj_x_[i], obj_x_[i] + 8,
                obj_lyre_[i] ? 110 : 180);
    }
    draw_rect(o, py_, py_ + 10, px_, px_ + 8, 236);
  }

 private:
  float px_, py_, obj_x_[8], score_;
  bool obj_live_[8], obj_lyre_[8];
  int lives_, respawn_delay_;
};

// ------------------------------------------------------------ atlantis ----
// Mirrors games/atlantis.py: ships cross four altitude bands, hitscan guns
// (center vertical, side 45° diagonals), death ray kills a city per
// completed band-0 pass; all six cities gone ends the game.
class Atlantis : public Game {
 public:
  int num_actions() const override { return 4; }

  void reset(Rng& rng) override {
    for (int i = 0; i < 4; ++i) {
      ship_live_[i] = false;
      ship_dir_[i] = rng.bernoulli() ? 1.0f : -1.0f;
      ship_band_[i] = i;
      ship_x_[i] = 0.0f;
    }
    for (int i = 0; i < 6; ++i) city_live_[i] = true;
    for (int g = 0; g < 3; ++g) cooldown_[g] = flash_[g] = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    static const float kSpeeds[4] = {0.8f, 1.2f, 1.7f, 2.3f};
    bool fire[3] = {action == 3, action == 1, action == 2};  // L, C, R
    float reward = 0.0f;
    for (int i = 0; i < 4; ++i)
      ship_x_[i] += ship_dir_[i] * kSpeeds[ship_band_[i]];

    for (int g = 0; g < 3; ++g) {
      bool ready = fire[g] && cooldown_[g] <= 0;
      if (ready) {
        for (int i = 0; i < 4; ++i) {
          if (!ship_live_[i]) continue;
          float cy = band_y(ship_band_[i]) + 3.0f;
          float cx = ship_x_[i] + 6.0f;
          float beam_x = g == 1 ? 80.0f
                                : (g == 0 ? 20.0f + (176.0f - cy)
                                          : 140.0f - (176.0f - cy));
          if (std::fabs(cx - beam_x) <= 5.0f + 6.0f) {
            ship_live_[i] = false;
            reward += 100.0f * (ship_band_[i] + 1);
          }
        }
        cooldown_[g] = 8;
        flash_[g] = 3;
      } else {
        cooldown_[g] = std::max(cooldown_[g] - 1, 0);
        flash_[g] = std::max(flash_[g] - 1, 0);
      }
    }

    for (int i = 0; i < 4; ++i) {
      bool off = ship_x_[i] < -12.0f || ship_x_[i] > 160.0f;
      if (ship_live_[i] && off) {
        if (ship_band_[i] == 0) {
          for (int c = 0; c < 6; ++c)
            if (city_live_[c]) { city_live_[c] = false; break; }
          ship_live_[i] = false;
        } else {
          --ship_band_[i];
          ship_x_[i] = ship_dir_[i] > 0 ? -11.0f : 159.0f;
        }
      }
      if (!ship_live_[i] && rng.uniform(0.0f, 1.0f) < 0.04f) {
        ship_dir_[i] = rng.bernoulli() ? 1.0f : -1.0f;
        ship_band_[i] = i;
        ship_x_[i] = ship_dir_[i] > 0 ? -11.0f : 159.0f;
        ship_live_[i] = true;
      }
    }
    *done = true;
    for (int c = 0; c < 6; ++c) *done = *done && !city_live_[c];
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 196, 210, 0, 160, 60);
    for (int c = 0; c < 6; ++c)
      if (city_live_[c])
        draw_rect(o, 180, 194, 14.0f + c * 24, 14.0f + c * 24 + 14, 170);
    for (float gx : {20.0f, 80.0f, 140.0f})
      draw_rect(o, 176, 182, gx - 3, gx + 3, 150);
    if (flash_[1] > 0) draw_rect(o, 30, 176, 79, 81, 220);
    for (int i = 0; i < 4; ++i) {
      if (!ship_live_[i]) continue;
      float y = band_y(ship_band_[i]);
      draw_rect(o, y, y + 6, ship_x_[i], ship_x_[i] + 12, 200);
    }
  }

 private:
  static float band_y(int band) {
    return 40.0f + (3 - band) * 18.0f + 6.0f;
  }
  float ship_x_[4], ship_dir_[4];
  bool ship_live_[4], city_live_[6];
  int ship_band_[4], cooldown_[3], flash_[3];
};

// -------------------------------------------------------------- skiing ----
// Mirrors games/skiing.py: fixed-length slalom, 20 gates, terminal reward
// −(elapsed centiseconds + 500 per missed gate).
class Skiing : public Game {
 public:
  int num_actions() const override { return 3; }

  void reset(Rng& rng) override {
    skier_x_ = 80.0f;
    course_y_ = 0.0f;
    frames_ = 0;
    for (int i = 0; i < 20; ++i) {
      gate_x_[i] = rng.uniform(28.0f, 132.0f);
      gate_passed_[i] = gate_judged_[i] = false;
    }
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    bool rt = action == 1, lf = action == 2;
    bool turning = rt || lf;
    skier_x_ = std::clamp(skier_x_ + (rt ? 2.0f : 0.0f) - (lf ? 2.0f : 0.0f),
                          8.0f, 152.0f);
    course_y_ += turning ? 1.2f : 3.0f;
    const float spacing = 6000.0f / 21.0f;
    for (int i = 0; i < 20; ++i) {
      float gy = (i + 1) * spacing;
      if (!gate_judged_[i] && gy <= course_y_) {
        gate_judged_[i] = true;
        gate_passed_[i] = std::fabs(gate_x_[i] - skier_x_) <= 12.0f;
      }
    }
    ++frames_;
    *done = course_y_ >= 6000.0f;
    if (!*done) return 0.0f;
    int missed = 0;
    for (int i = 0; i < 20; ++i) missed += gate_passed_[i] ? 0 : 1;
    return -(frames_ * 100.0f / 60.0f + 500.0f * missed);
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 0, 210, 0, 6, 60);
    draw_rect(o, 0, 210, 154, 160, 60);
    const float spacing = 6000.0f / 21.0f;
    for (int i = 0; i < 20; ++i) {
      if (gate_judged_[i]) continue;
      float sy = 60.0f + ((i + 1) * spacing - course_y_);
      if (sy < 0.0f || sy >= 204.0f) continue;
      draw_rect(o, sy, sy + 8, gate_x_[i] - 13.5f, gate_x_[i] - 10.5f, 140);
      draw_rect(o, sy, sy + 8, gate_x_[i] + 10.5f, gate_x_[i] + 13.5f, 140);
    }
    draw_rect(o, 60, 70, skier_x_ - 3, skier_x_ + 3, 236);
  }

 private:
  float skier_x_, course_y_, gate_x_[20];
  bool gate_passed_[20], gate_judged_[20];
  int frames_;
};

// ------------------------------------------------------------- boxing ----
// Same dynamics as the JAX-native game (games/boxing.py): two boxers, 18
// full-set actions, +1/-1 per punch landed/taken, 2-minute bout, 100-hit KO.
class Boxing : public Game {
 public:
  int num_actions() const override { return 18; }

  void reset(Rng& rng) override {
    float y0 = (45.0f + 178.0f) / 2.0f - 11.0f;
    px_ = 32.0f + 12.0f;
    ex_ = 124.0f - 12.0f - 8.0f;
    py_ = y0 + rng.uniform(-16.0f, 16.0f);
    ey_ = y0 + rng.uniform(-16.0f, 16.0f);
    p_punch_ = e_punch_ = p_cool_ = 0;
    e_cool_ = rng.randint(0, 24);
    p_hits_ = e_hits_ = frame_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    // Full-action-set decode (order per gym_atari.py's 18-action table).
    auto in = [&](std::initializer_list<int> set) {
      for (int a : set) if (action == a) return true;
      return false;
    };
    bool up = in({2, 6, 7, 10, 14, 15}), down = in({5, 8, 9, 13, 16, 17});
    bool right = in({3, 6, 8, 11, 14, 16}), left = in({4, 7, 9, 12, 15, 17});
    bool fire = action == 1 || action >= 10;
    px_ = std::clamp(px_ + (right - left) * 2.0f, 32.0f, 124.0f - 8.0f);
    py_ = std::clamp(py_ + (down - up) * 2.0f, 45.0f, 178.0f - 22.0f);

    // Enemy: hold range just inside reach, align vertically, counterpunch.
    float gap = px_ + 8.0f - ex_;
    float wx = gap < -14.0f + 2.0f ? -1.4f : (gap > -4.0f ? 1.4f : 0.0f);
    ex_ = std::clamp(ex_ + wx, 32.0f, 124.0f - 8.0f);
    ey_ = std::clamp(ey_ + std::clamp(py_ - ey_, -1.4f, 1.4f), 45.0f,
                     178.0f - 22.0f);

    bool aligned = std::fabs(py_ - ey_) <= 14.0f;
    float dist = ex_ - (px_ + 8.0f);
    bool p_start = fire && p_cool_ <= 0;
    bool e_start = aligned && dist <= 14.0f && e_cool_ <= 0 &&
                   rng.uniform(0.0f, 1.0f) < 0.25f;
    p_punch_ = p_start ? 4 : std::max(p_punch_ - 1, 0);
    e_punch_ = e_start ? 4 : std::max(e_punch_ - 1, 0);
    p_cool_ = p_start ? 24 : std::max(p_cool_ - 1, 0);
    e_cool_ = e_start ? 24 : std::max(e_cool_ - 1, 0);

    bool p_lands = p_start && aligned && dist <= 14.0f;
    bool e_lands = e_start && aligned && dist <= 14.0f && !p_lands;
    if (p_lands) ex_ = std::clamp(ex_ + 6.0f, 32.0f, 124.0f - 8.0f);
    if (e_lands) px_ = std::clamp(px_ - 6.0f, 32.0f, 124.0f - 8.0f);
    p_hits_ += p_lands;
    e_hits_ += e_lands;

    ++frame_;
    *done = frame_ >= 7200 || p_hits_ >= 100 || e_hits_ >= 100;
    return float(p_lands) - float(e_lands);
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 39, 184, 24, 140, 90);  // mat
    draw_rect(o, 39, 41, 24, 140, 150);  // ropes
    draw_rect(o, 182, 184, 24, 140, 150);
    float pr = p_punch_ > 0 ? 14.0f : 3.0f;
    float er = e_punch_ > 0 ? 14.0f : 3.0f;
    // draw_rect max-blends, so the enemy must sit ABOVE the mat's 90 to be
    // visible (the JAX renderer overwrites, so its dark-on-light enemy is
    // fine; a luma-20 enemy here would vanish into the mat entirely).
    draw_rect(o, py_ + 6, py_ + 10, px_ + 8, px_ + 8 + pr, 200);
    draw_rect(o, ey_ + 6, ey_ + 10, ex_ - er, ex_, 160);
    draw_rect(o, py_, py_ + 22, px_, px_ + 8, 252);
    draw_rect(o, ey_, ey_ + 22, ex_, ex_ + 8, 180);
    draw_rect(o, 16, 22, 16, 16.0f + std::min(p_hits_, 64), 252);
    draw_rect(o, 16, 22, 144.0f - std::min(e_hits_, 64), 144, 30);
  }

 private:
  float px_, py_, ex_, ey_;
  int p_punch_, e_punch_, p_cool_, e_cool_, p_hits_, e_hits_, frame_;
};

// ------------------------------------------------------------- enduro ----
// Same dynamics as the JAX-native game (games/enduro.py): 9-action racing,
// +1 per clean overtake / -1 when re-passed, collisions drop speed.
class Enduro : public Game {
 public:
  int num_actions() const override { return 9; }

  void reset(Rng& rng) override {
    px_ = 76.0f;
    speed_ = 0.8f;
    passed_ = frame_ = 0;
    for (int i = 0; i < kCars; ++i) respawn(i, rng, /*initial=*/true);
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    bool fire = action == 1 || action == 7 || action == 8;
    bool right = action == 2 || action == 5 || action == 7;
    bool left = action == 3 || action == 6 || action == 8;
    bool brake = action == 4 || action == 5 || action == 6;
    speed_ = std::clamp(speed_ + (fire ? 0.08f : 0.0f)
                        - (brake ? 0.2f : 0.0f) - 0.02f, 0.0f, 6.0f);
    px_ = std::clamp(px_ + (right - left) * 2.5f, 42.0f, 110.0f);

    float rel = speed_ - 2.4f;
    float reward = 0.0f;
    bool any_hit = false;
    for (int i = 0; i < kCars; ++i) {
      float z0 = z_[i];
      z_[i] -= rel;
      bool down = z0 > 0.0f && z_[i] <= 0.0f;
      bool up = z0 <= 0.0f && z_[i] > 0.0f;
      bool same = std::fabs(kLaneX[lane_[i]] - px_) < 14.0f;
      bool hit = (down || up || std::fabs(z_[i]) < 2.0f) && same;
      if (hit) {
        any_hit = true;
        z_[i] = 12.0f;
      } else if (down) {
        reward += 1.0f;
        ++passed_;
      } else if (up) {
        reward -= 1.0f;
        --passed_;
      }
      if (z_[i] < -60.0f) respawn(i, rng);
    }
    if (any_hit) speed_ = 0.8f;
    ++frame_;
    *done = frame_ >= 10000;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 54, 100, 56, 104, 90);
    draw_rect(o, 100, 140, 44, 116, 90);
    draw_rect(o, 140, 182, 32, 128, 90);
    for (int i = 0; i < kCars; ++i) {
      if (z_[i] <= 0.0f) continue;
      float t = std::sqrt(std::min(z_[i], 400.0f) / 400.0f);
      float y = 160.0f - (160.0f - 58.0f) * t;
      float s = 1.0f - 0.7f * t;
      float x = 80.0f + (kLaneX[lane_[i]] - 80.0f) * (1.0f - 0.6f * t);
      draw_rect(o, y - 10.0f * s, y, x - 7.0f * s, x + 7.0f * s, 170);
    }
    draw_rect(o, 160, 170, px_ - 7, px_ + 7, 236);
    draw_rect(o, 192, 198, 16,
              16.0f + std::clamp(passed_, 0, 128), 200);
  }

 private:
  static constexpr int kCars = 6;
  static constexpr float kLaneX[3] = {52.0f, 76.0f, 100.0f};
  // JAX enduro_init spawns the initial field at [0.5, 1.0]·SPAWN_AHEAD and
  // recycles at [0.6, 1.0]·SPAWN_AHEAD; mirror both bands.
  void respawn(int i, Rng& rng, bool initial = false) {
    z_[i] = rng.uniform(initial ? 200.0f : 240.0f, 400.0f);
    lane_[i] = rng.randint(0, 3);
  }
  float px_, speed_, z_[kCars];
  int lane_[kCars], passed_, frame_;
};

// ---------------------------------------------------------- ms_pacman ----
// Same dynamics as the JAX-native game (games/ms_pacman.py): 21x19 maze,
// cell-quantized movement (ghosts on the opposite phase), pellets/power
// pellets/fright, doubling ghost bounties, 3 lives.
class MsPacman : public Game {
 public:
  int num_actions() const override { return 9; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    (void)rng;
    for (int r = 0; r < kR; ++r)
      for (int c = 0; c < kC; ++c) {
        pellet_[r][c] = kMaze[r][c] == '.';
        power_[r][c] = kMaze[r][c] == 'o';
      }
    start_positions();
    want_ = pdir_ = 4;
    fright_ = combo_ = frame_ = 0;
    lives_ = 3;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *life_lost = false;
    static const int kDR[5] = {-1, 0, 1, 0, 0}, kDC[5] = {0, 1, 0, -1, 0};
    static const int kPrim[9] = {4, 0, 1, 3, 2, 1, 3, 1, 3};
    static const int kSec[9] = {4, 0, 1, 3, 2, 0, 0, 2, 2};
    int prim = kPrim[action], sec = kSec[action];
    if (prim != 4) want_ = prim;
    float reward = 0.0f;
    // Pre-move positions, for swapped-cell contact detection (the JAX game
    // treats player↔ghost cell swaps in one tick as contact; when
    // frightened both move on frames ≡ 4 mod 6, so pass-throughs happen).
    int old_pr = pr_, old_pc = pc_;
    int old_gr[4], old_gc[4];
    for (int g = 0; g < 4; ++g) { old_gr[g] = gr_[g]; old_gc[g] = gc_[g]; }
    bool ate_power = false;

    if (frame_ % 2 == 0) {  // player phase
      int d = 4;
      if (open(pr_ + kDR[want_], pc_ + kDC[want_]) && want_ != 4) d = want_;
      else if (prim != 4 && sec != 4 && open(pr_ + kDR[sec], pc_ + kDC[sec]))
        d = sec;
      else if (pdir_ != 4 && open(pr_ + kDR[pdir_], pc_ + kDC[pdir_]))
        d = pdir_;
      pdir_ = d;
      pr_ += kDR[d];
      pc_ = (pc_ + kDC[d] + kC) % kC;
      if (pellet_[pr_][pc_]) { pellet_[pr_][pc_] = false; reward += 10.0f; }
      if (power_[pr_][pc_]) {
        power_[pr_][pc_] = false;
        reward += 50.0f;
        fright_ = 360;
        combo_ = 0;
        ate_power = true;
      }
    }
    // The eat frame keeps the full 360 (JAX: where(ate_power, POWER_FRAMES,
    // max(fright-1, 0)) skips the decrement that step).
    if (fright_ > 0 && !ate_power) --fright_;

    int period = fright_ > 0 ? 3 : 2;
    if (frame_ % period == 1) {  // ghost phase
      for (int g = 0; g < 4; ++g) {
        int best = -1;
        float best_score = 1e9f;
        int rev = gdir_[g] < 4 ? (gdir_[g] + 2) % 4 : -1;
        int n_open = 0;
        for (int d = 0; d < 4; ++d)
          n_open += open(gr_[g] + kDR[d], gc_[g] + kDC[d]);
        bool random_pick = rng.uniform(0.0f, 1.0f) < 0.25f;
        for (int d = 0; d < 4; ++d) {
          if (!open(gr_[g] + kDR[d], gc_[g] + kDC[d])) continue;
          if (d == rev && n_open > 1) continue;
          int nr = gr_[g] + kDR[d], nc = (gc_[g] + kDC[d] + kC) % kC;
          int dcol = std::abs(nc - pc_);
          float dist = std::abs(nr - pr_) + std::min(dcol, kC - dcol);
          float score = fright_ > 0 ? -dist : dist;
          if (random_pick) score = rng.uniform(0.0f, 10.0f);
          else score += rng.uniform(0.0f, 0.5f);
          if (score < best_score) { best_score = score; best = d; }
        }
        if (best >= 0) {
          gdir_[g] = best;
          gr_[g] += kDR[best];
          gc_[g] = (gc_[g] + kDC[best] + kC) % kC;
        }
      }
    }

    bool died = false;
    for (int g = 0; g < 4; ++g) {
      bool same = gr_[g] == pr_ && gc_[g] == pc_;
      bool swapped = gr_[g] == old_pr && gc_[g] == old_pc &&
                     old_gr[g] == pr_ && old_gc[g] == pc_;
      if (!same && !swapped) continue;
      if (fright_ > 0) {
        reward += 200.0f * float(1 << combo_);
        ++combo_;
        gr_[g] = kHomeR;
        gc_[g] = kHomeC;
      } else {
        died = true;
      }
    }
    if (died) {
      --lives_;
      start_positions();
      pdir_ = want_ = 4;
      fright_ = 0;
      *life_lost = lives_ > 0;
    }

    bool any = false;
    for (int r = 0; r < kR && !any; ++r)
      for (int c = 0; c < kC; ++c)
        if (pellet_[r][c] || power_[r][c]) { any = true; break; }
    if (!any)
      for (int r = 0; r < kR; ++r)
        for (int c = 0; c < kC; ++c) {
          pellet_[r][c] = kMaze[r][c] == '.';
          power_[r][c] = kMaze[r][c] == 'o';
        }

    ++frame_;
    *done = lives_ <= 0 || frame_ >= 20000;
    return reward;
  }

  void render(uint8_t* o) const override {
    auto cell = [&](int r, int c, uint8_t v) {
      draw_rect(o, 22.0f + r * 8, 22.0f + r * 8 + 8, 4.0f + c * 8,
                4.0f + c * 8 + 8, v);
    };
    for (int r = 0; r < kR; ++r)
      for (int c = 0; c < kC; ++c) {
        if (kMaze[r][c] == 'W') cell(r, c, 70);
        else if (power_[r][c]) cell(r, c, 190);
        else if (pellet_[r][c]) cell(r, c, 110);
      }
    // Frightened luma must exceed the power pellet's 190 (max-blend: a 140
    // ghost standing on an uneaten power cell would be invisible).
    for (int g = 0; g < 4; ++g)
      cell(gr_[g], gc_[g], fright_ > 0 ? 240 : uint8_t(160 + 20 * g));
    cell(pr_, pc_, 252);
    draw_rect(o, 200, 206, 8, 8.0f + 10 * lives_, 252);
  }

 private:
  static constexpr int kR = 21, kC = 19, kHomeR = 9, kHomeC = 8;
  static constexpr const char* kMaze[kR] = {
      "WWWWWWWWWWWWWWWWWWW", "W........W........W", "WoWW.WWW.W.WWW.WWoW",
      "W.................W", "W.WW.W.WWWWW.W.WW.W", "W....W...W...W....W",
      "WWWW.WWW.W.WWW.WWWW", "WWWW.W       W.WWWW", "WWWW.W WW WW W.WWWW",
      "    .  WGGGW  .    ", "WWWW.W WWWWW W.WWWW", "WWWW.W       W.WWWW",
      "WWWW.W WWWWW W.WWWW", "W........W........W", "W.WW.WWW.W.WWW.WW.W",
      "Wo.W.....P.....W.oW", "WW.W.W.WWWWW.W.W.WW", "W....W...W...W....W",
      "W.WWWWWW.W.WWWWWW.W", "W.................W", "WWWWWWWWWWWWWWWWWWW"};
  bool open(int r, int c) const {
    c = (c + kC) % kC;
    return r >= 0 && r < kR && kMaze[r][c] != 'W';
  }
  void start_positions() {
    pr_ = 15;
    pc_ = 9;
    int i = 0;
    for (int r = 0; r < kR; ++r)
      for (int c = 0; c < kC; ++c)
        if (kMaze[r][c] == 'G' && i < 4) { gr_[i] = r; gc_[i] = c; ++i; }
    while (i < 4) { gr_[i] = gr_[i - 1]; gc_[i] = gc_[i - 1]; ++i; }
    for (int g = 0; g < 4; ++g) gdir_[g] = 0;
  }
  bool pellet_[kR][kC], power_[kR][kC];
  int pr_, pc_, pdir_, want_, gr_[4], gc_[4], gdir_[4];
  int fright_, combo_, lives_, frame_;
};


// --------------------------------------------------------------- qbert ----
// Same dynamics as the JAX-native game (games/qbert.py): 7-row cube
// pyramid, diagonal hops every 16 frames, +25 per newly colored cube,
// +1000 board bonus, Coily chase + red ball, 4 lives, falls cost a life.
class Qbert : public Game {
 public:
  int num_actions() const override { return 6; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    (void)rng;
    for (int r = 0; r < 7; ++r)
      for (int c = 0; c < 7; ++c) colored_[r][c] = false;
    pr_ = pc_ = 0;
    cr_ = br_ = -1;
    cc_ = bc_ = 0;
    lives_ = 4;
    freeze_ = frame_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    ++frame_;
    bool frozen = freeze_ > 0;
    if (freeze_ > 0) --freeze_;
    float reward = 0.0f;

    if (frame_ == 1 && !colored_[0][0]) {  // spawn cube scores
      colored_[0][0] = true;
      reward += 25.0f;
    }

    // Player hop: UP(2)=up-right, RIGHT(3)=down-right, LEFT(4)=up-left,
    // DOWN(5)=down-left.
    static const int kDr[6] = {0, 0, -1, 1, -1, 1};
    static const int kDc[6] = {0, 0, 0, 1, -1, 0};
    bool fell = false;
    if (!frozen && frame_ % 16 == 0 && kDr[action] != 0) {
      int tr = pr_ + kDr[action], tc = pc_ + kDc[action];
      if (tr >= 0 && tr < 7 && tc >= 0 && tc <= tr) {
        pr_ = tr;
        pc_ = tc;
        if (!colored_[pr_][pc_]) { colored_[pr_][pc_] = true; reward += 25.0f; }
      } else {
        fell = true;
      }
    }

    // Board complete -> bonus + refresh.
    bool complete = true;
    for (int r = 0; r < 7 && complete; ++r)
      for (int c = 0; c <= r; ++c)
        if (!colored_[r][c]) { complete = false; break; }
    if (complete) {
      reward += 1000.0f;
      for (int r = 0; r < 7; ++r)
        for (int c = 0; c < 7; ++c) colored_[r][c] = false;
    }

    // Red ball: spawn near the apex, bounce down, roll off the bottom.
    bool spawned_ball = false;
    if (br_ < 0 && frame_ % 280 == 0 && !frozen) {
      br_ = 1;
      bc_ = rng.bernoulli() ? 1 : 0;
      spawned_ball = true;
    }
    if (br_ >= 0 && frame_ % 18 == 0 && !frozen && !spawned_ball) {
      ++br_;
      bc_ += rng.bernoulli() ? 1 : 0;
      if (br_ >= 7) br_ = -1;
    }

    // Coily: hatch then greedy-chase the player.
    bool hatched = false;
    if (cr_ < 0 && frame_ > 140 && !frozen) {
      cr_ = cc_ = 0;
      hatched = true;
    }
    if (cr_ >= 0 && frame_ % 20 == 0 && !frozen && !hatched) {
      static const int hr[4] = {-1, -1, 1, 1};
      static const int hc[4] = {-1, 0, 0, 1};
      int best = -1;
      float best_d = 1e9f;
      for (int k = 0; k < 4; ++k) {
        int tr = cr_ + hr[k], tc = cc_ + hc[k];
        if (!(tr >= 0 && tr < 7 && tc >= 0 && tc <= tr)) continue;
        float dd = std::abs(tr - pr_) + std::abs(tc - pc_)
            + rng.uniform(0.0f, 0.3f);
        if (dd < best_d) { best_d = dd; best = k; }
      }
      if (best >= 0) { cr_ += hr[best]; cc_ += hc[best]; }
    }

    bool caught = cr_ >= 0 && cr_ == pr_ && cc_ == pc_ && !frozen;
    bool balled = br_ >= 0 && br_ == pr_ && bc_ == pc_ && !frozen;
    bool died = fell || caught || balled;
    if (died) {
      --lives_;
      pr_ = pc_ = 0;
      cr_ = br_ = -1;
      freeze_ = 30;
      if (lives_ > 0 && !colored_[0][0]) {  // respawn scores a fresh apex
        colored_[0][0] = true;
        reward += 25.0f;
      }
    }
    *done = lives_ <= 0 || frame_ >= 20000;
    *life_lost = died && !*done;
    return reward;
  }

  void render(uint8_t* o) const override {
    for (int r = 0; r < 7; ++r)
      for (int c = 0; c <= r; ++c) {
        float x = 80.0f + (2.0f * c - r) * 11.0f - 11.0f;
        float y = 38.0f + r * 24.0f;
        draw_rect(o, y, y + 11, x, x + 22, colored_[r][c] ? 180 : 95);
        draw_rect(o, y + 11, y + 19, x + 3, x + 19, 60);
      }
    auto blob = [&](int r, int c, float w, float h, float dy, uint8_t v) {
      float x = 80.0f + (2.0f * c - r) * 11.0f - 11.0f + 11.0f - w / 2;
      float y = 38.0f + r * 24.0f + dy;
      draw_rect(o, y, y + h, x, x + w, v);
    };
    if (br_ >= 0) blob(br_, bc_, 6, 6, -6, 130);
    if (cr_ >= 0) blob(cr_, cc_, 8, 12, -12, 150);
    blob(pr_, pc_, 8, 10, -10, 240);
    draw_rect(o, 200, 206, 8, 8.0f + 10 * lives_, 240);
  }

 private:
  bool colored_[7][7];
  int pr_, pc_, cr_, cc_, br_, bc_, lives_, freeze_, frame_;
};

// -------------------------------------------------------------- zaxxon ----
// Same dynamics as the JAX-native game (games/zaxxon.py): scrolling
// fortress, walls with a gap, 4 enemy slots (drones +50 / turrets +100),
// one limited-range shot, 3 lives.
class Zaxxon : public Game {
 public:
  int num_actions() const override { return 18; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    ship_y_ = 110.0f;
    shot_x_ = -1.0f;
    shot_y_ = 0.0f;
    for (int i = 0; i < 4; ++i) spawn(i, rng, 120.0f + 90.0f * i);
    wall_x_ = 300.0f;
    gap_y_ = rng.uniform(62.0f, 162.0f);
    lives_ = 3;
    freeze_ = frame_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    ++frame_;
    bool frozen = freeze_ > 0;
    if (freeze_ > 0) --freeze_;

    static const bool kUp[18] = {0, 0, 1, 0, 0, 0, 1, 1, 0, 0,
                                 1, 0, 0, 0, 1, 1, 0, 0};
    static const bool kDown[18] = {0, 0, 0, 0, 0, 1, 0, 0, 1, 1,
                                   0, 0, 0, 1, 0, 0, 1, 1};
    static const bool kFire[18] = {0, 1, 0, 0, 0, 0, 0, 0, 0, 0,
                                   1, 1, 1, 1, 1, 1, 1, 1};
    if (!frozen) {
      if (kUp[action]) ship_y_ -= 2.5f;
      if (kDown[action]) ship_y_ += 2.5f;
    }
    ship_y_ = std::clamp(ship_y_, 44.0f, 180.0f);

    bool shot_live = shot_x_ >= 0;
    if (kFire[action] && !shot_live && !frozen) {
      shot_x_ = 28.0f + 14.0f;
      shot_y_ = ship_y_ + 4.0f;
    } else if (shot_live) {
      shot_x_ += 6.0f;
    }
    if (shot_x_ > 140.0f) shot_x_ = -1.0f;  // limited range (JAX parity)

    float scroll = frozen ? 0.0f : 2.0f;
    for (int i = 0; i < 4; ++i) ex_[i] -= scroll;
    wall_x_ -= scroll;

    float reward = 0.0f;
    if (shot_x_ >= 0) {
      for (int i = 0; i < 4; ++i) {
        if (!alive_[i]) continue;
        if (shot_x_ + 2 >= ex_[i] && shot_x_ <= ex_[i] + 10 &&
            shot_y_ + 2 >= ey_[i] && shot_y_ <= ey_[i] + 8) {
          reward += turret_[i] ? 100.0f : 50.0f;
          alive_[i] = false;
          shot_x_ = -1.0f;
          break;  // one shot, one kill
        }
      }
    }

    for (int i = 0; i < 4; ++i)
      if (!alive_[i] || ex_[i] < -10.0f) {
        spawn(i, rng, 220.0f);
        alive_[i] = true;
      }

    if (wall_x_ < -6.0f) {
      gap_y_ = rng.uniform(62.0f, 162.0f);
      wall_x_ += 360.0f;
    }

    bool wall_overlap = wall_x_ <= 28.0f + 14.0f && wall_x_ + 6.0f >= 28.0f;
    bool in_gap = ship_y_ >= gap_y_ - 18.0f && ship_y_ + 8.0f <= gap_y_ + 18.0f;
    bool died = wall_overlap && !in_gap && !frozen;
    for (int i = 0; i < 4 && !died; ++i)
      died = alive_[i] && ex_[i] <= 42.0f && ex_[i] + 10.0f >= 28.0f &&
             ey_[i] <= ship_y_ + 8.0f && ey_[i] + 8.0f >= ship_y_ && !frozen;
    if (died) {
      --lives_;
      ship_y_ = 110.0f;
      wall_x_ += 360.0f;
      for (int i = 0; i < 4; ++i)
        if (ex_[i] < 120.0f) ex_[i] += 200.0f;
      freeze_ = 40;
      shot_x_ = -1.0f;
    }
    *done = lives_ <= 0 || frame_ >= 15000;
    *life_lost = died && !*done;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 182, 210, 0, 160, 70);  // ground
    draw_rect(o, 36, gap_y_ - 18.0f, wall_x_, wall_x_ + 6, 150);
    draw_rect(o, gap_y_ + 18.0f, 182, wall_x_, wall_x_ + 6, 150);
    for (int i = 0; i < 4; ++i)
      if (alive_[i])
        draw_rect(o, ey_[i], ey_[i] + 8, ex_[i], ex_[i] + 10,
                  turret_[i] ? 120 : 170);
    if (shot_x_ >= 0) draw_rect(o, shot_y_, shot_y_ + 2, shot_x_,
                                shot_x_ + 4, 230);
    draw_rect(o, ship_y_, ship_y_ + 8, 28, 42, 250);
    draw_rect(o, 200, 206, 8, 8.0f + 10 * lives_, 250);
  }

 private:
  void spawn(int i, Rng& rng, float x_base) {
    turret_[i] = rng.uniform(0.0f, 1.0f) < 0.4f;
    ex_[i] = x_base + rng.uniform(0.0f, 140.0f);
    ey_[i] = turret_[i] ? 172.0f : rng.uniform(44.0f, 150.0f);
  }
  float ship_y_, shot_x_, shot_y_, ex_[4], ey_[4], wall_x_, gap_y_;
  bool turret_[4], alive_[4];
  int lives_, freeze_, frame_;
};


// ------------------------------------------------------------- bowling ----
// Same dynamics as the JAX-native game (games/bowling.py): ten frames of
// two rolls at a ten-pin triangle, one hook input per roll, +pins as they
// fall, +10 strike / +5 spare paid at frame end.
class Bowling : public Game {
 public:
  int num_actions() const override { return 6; }

  void reset(Rng& rng) override {
    (void)rng;
    bowler_y_ = 110.0f;
    ball_x_ = -1.0f;
    ball_y_ = 110.0f;
    ball_vy_ = 0.0f;
    hooked_ = false;
    for (int i = 0; i < 10; ++i) pins_[i] = true;
    frame_no_ = roll_no_ = pins_frame_ = settle_ = frame_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    (void)rng;
    *done = false;
    *life_lost = false;
    ++frame_;
    bool settling = settle_ > 0;
    if (settle_ > 0) --settle_;
    bool rolling = ball_x_ >= 0;
    bool up = action == 2, down = action == 5, fire = action == 1;

    if (!rolling && !settling) {
      if (up) bowler_y_ -= 2.0f;
      if (down) bowler_y_ += 2.0f;
      bowler_y_ = std::clamp(bowler_y_, 66.0f, 154.0f);
    }
    bool release = fire && !rolling && !settling;
    if (release) {
      ball_x_ = 34.0f;
      ball_y_ = bowler_y_;
      ball_vy_ = 0.0f;
      hooked_ = false;
    }
    if ((up || down) && rolling && !hooked_) {
      ball_vy_ = up ? -0.9f : 0.9f;
      hooked_ = true;
    }
    bool moving = rolling || release;
    if (moving) {
      ball_x_ += 3.0f;
      ball_y_ = std::clamp(ball_y_ + ball_vy_, 62.0f, 158.0f);
    }

    float reward = 0.0f;
    int downed = 0;
    if (moving) {
      for (int i = 0; i < 10; ++i) {
        if (!pins_[i]) continue;
        float px, py;
        pin_pos(i, &px, &py);
        float dx = px - ball_x_, dy = py - ball_y_;
        if (dx * dx + dy * dy <= 36.0f) {
          pins_[i] = false;
          ++downed;
        }
      }
    }
    reward += downed;
    pins_frame_ += downed;

    bool roll_over = moving && ball_x_ > 120.0f + 3 * 9.0f + 10.0f;
    if (roll_over) {
      bool strike = roll_no_ == 0 && pins_frame_ >= 10;
      bool frame_done = roll_no_ == 1 || strike;
      bool spare = frame_done && !strike && pins_frame_ >= 10;
      if (strike) reward += 10.0f;
      else if (spare) reward += 5.0f;
      ball_x_ = -1.0f;
      settle_ = 40;
      if (frame_done) {
        roll_no_ = 0;
        ++frame_no_;
        for (int i = 0; i < 10; ++i) pins_[i] = true;
        pins_frame_ = 0;
      } else {
        ++roll_no_;
      }
    }
    *done = frame_no_ >= 10;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 60, 160, 12, 156, 110);  // lane
    for (int i = 0; i < 10; ++i) {
      if (!pins_[i]) continue;
      float px, py;
      pin_pos(i, &px, &py);
      draw_rect(o, py - 4, py + 4, px - 2, px + 2, 240);
    }
    if (ball_x_ >= 0)
      draw_rect(o, ball_y_ - 3, ball_y_ + 3, ball_x_ - 3, ball_x_ + 3, 30);
    draw_rect(o, bowler_y_ - 8, bowler_y_ + 8, 18, 30, 200);
    draw_rect(o, 20, 26, 12, 12.0f + 14 * frame_no_, 240);
  }

 private:
  static void pin_pos(int i, float* x, float* y) {
    static const int col[10] = {0, 1, 1, 2, 2, 2, 3, 3, 3, 3};
    static const int row[10] = {0, 0, 1, 0, 1, 2, 0, 1, 2, 3};
    *x = 120.0f + col[i] * 9.0f;
    *y = 110.0f + (row[i] - col[i] / 2.0f) * 11.0f;
  }
  float bowler_y_, ball_x_, ball_y_, ball_vy_;
  bool hooked_, pins_[10];
  int frame_no_, roll_no_, pins_frame_, settle_, frame_;
};

// ------------------------------------------------------- fishing_derby ----
// Same dynamics as the JAX-native game (games/fishing_derby.py): 6 fish
// lanes, active reel (UP) with escape chance otherwise, shark steals,
// scripted opponent scoring to 99, signed reward.
class FishingDerby : public Game {
 public:
  int num_actions() const override { return 18; }

  void reset(Rng& rng) override {
    hook_x_ = 46.0f;
    hook_y_ = 94.0f;
    hooked_ = -1;
    for (int i = 0; i < 6; ++i) {
      fish_x_[i] = rng.uniform(10.0f, 150.0f);
      fish_d_[i] = rng.bernoulli() ? 1.0f : -1.0f;
    }
    shark_x_ = 80.0f;
    shark_d_ = 1.0f;
    my_ = opp_ = 0.0f;
    frame_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    ++frame_;
    static const bool kUp[18] = {0, 0, 1, 0, 0, 0, 1, 1, 0, 0,
                                 1, 0, 0, 0, 1, 1, 0, 0};
    static const bool kDown[18] = {0, 0, 0, 0, 0, 1, 0, 0, 1, 1,
                                   0, 0, 0, 1, 0, 0, 1, 1};
    static const bool kLeft[18] = {0, 0, 0, 0, 1, 0, 0, 1, 0, 1,
                                   0, 0, 1, 0, 0, 1, 0, 1};
    static const bool kRight[18] = {0, 0, 0, 1, 0, 0, 1, 0, 1, 0,
                                    0, 1, 0, 0, 1, 0, 1, 0};
    bool up = kUp[action], down = kDown[action];
    bool left = kLeft[action], right = kRight[action];

    for (int i = 0; i < 6; ++i) {
      fish_x_[i] += fish_d_[i] * (0.8f + 0.1f * i);
      if (fish_x_[i] < 6.0f || fish_x_[i] > 154.0f) fish_d_[i] = -fish_d_[i];
      fish_x_[i] = std::clamp(fish_x_[i], 6.0f, 154.0f);
    }
    shark_x_ += shark_d_ * 1.6f;
    if (shark_x_ < 10.0f || shark_x_ > 140.0f) shark_d_ = -shark_d_;
    shark_x_ = std::clamp(shark_x_, 10.0f, 140.0f);

    bool reeling = hooked_ >= 0;
    if (left) hook_x_ -= 2.0f;
    if (right) hook_x_ += 2.0f;
    hook_x_ = std::clamp(hook_x_, 20.0f, 72.0f);
    float lane5 = lane_y(5) + 6.0f;
    if (reeling) {
      hook_y_ = std::clamp(hook_y_ + (up ? -2.5f : 1.2f), 88.0f, lane5);
    } else {
      if (up) hook_y_ -= 2.0f;
      if (down) hook_y_ += 2.0f;
      hook_y_ = std::clamp(hook_y_, 88.0f, lane5);
    }
    bool escaped = reeling && !up && rng.uniform(0.0f, 1.0f) < 0.05f;

    if (!reeling) {
      for (int i = 0; i < 6; ++i) {
        if (std::fabs(fish_x_[i] - hook_x_) < 8.0f &&
            std::fabs(lane_y(i) - hook_y_) < 6.0f) {
          hooked_ = i;
          break;
        }
      }
    }
    if (hooked_ >= 0) fish_x_[hooked_] = hook_x_;

    float reward = 0.0f;
    bool landed = hooked_ >= 0 && hook_y_ <= 88.0f;
    bool stolen = hooked_ >= 0 && !landed && hook_y_ <= 78.0f &&
                  std::fabs(shark_x_ + 9.0f - hook_x_) < 11.0f;
    static const float kVal[6] = {2, 2, 4, 4, 6, 6};
    if (landed) {
      reward += kVal[hooked_];
      my_ += kVal[hooked_];
    }
    if (landed || stolen) {
      fish_x_[hooked_] = rng.bernoulli() ? 10.0f : 150.0f;
      hooked_ = -1;
      hook_y_ = 94.0f;
    } else if (escaped) {
      hooked_ = -1;
    }

    if (frame_ % 110 == 0) {
      reward -= 4.0f;
      opp_ += 4.0f;
    }
    *done = my_ >= 99.0f || opp_ >= 99.0f || frame_ >= 12000;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 84, 210, 0, 160, 60);  // water
    draw_rect(o, 60, 84, 8, 36, 120);   // piers
    draw_rect(o, 60, 84, 124, 152, 120);
    for (int i = 0; i < 6; ++i)
      draw_rect(o, lane_y(i) - 3, lane_y(i) + 3, fish_x_[i] - 6,
                fish_x_[i] + 6, 200);
    draw_rect(o, 70, 80, shark_x_, shark_x_ + 18, 90);
    draw_rect(o, 74, hook_y_ + 2, hook_x_ - 1, hook_x_ + 1, 230);
    draw_rect(o, hook_y_ - 2, hook_y_ + 3, hook_x_ - 2, hook_x_ + 3, 250);
    draw_rect(o, 20, 26, 8, 8.0f + my_, 240);
    draw_rect(o, 30, 36, 8, 8.0f + opp_, 170);
  }

 private:
  static float lane_y(int i) { return 84.0f + 14.0f + i * 18.0f; }
  float hook_x_, hook_y_, fish_x_[6], fish_d_[6], shark_x_, shark_d_;
  float my_, opp_;
  int hooked_, frame_;
};


// -------------------------------------------------------------- tennis ----
// Same dynamics as the JAX-native game (games/tennis.py): baseline
// rallies, fast tracking opponent, fumbles only on fast-angled balls,
// +/-1 per point, 24-point set.
class Tennis : public Game {
 public:
  int num_actions() const override { return 18; }

  void reset(Rng& rng) override {
    (void)rng;
    px_ = ox_ = bx_ = 80.0f;
    by_ = 115.0f;
    bvx_ = bvy_ = 0.0f;
    serve_timer_ = 40;
    serve_to_player_ = true;
    points_ = frame_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    ++frame_;
    static const bool kLeft[18] = {0, 0, 0, 0, 1, 0, 0, 1, 0, 1,
                                   0, 0, 1, 0, 0, 1, 0, 1};
    static const bool kRight[18] = {0, 0, 0, 1, 0, 0, 1, 0, 1, 0,
                                    0, 1, 0, 0, 1, 0, 1, 0};
    if (kLeft[action]) px_ -= 2.6f;
    if (kRight[action]) px_ += 2.6f;
    px_ = std::clamp(px_, 23.0f, 137.0f);
    ox_ += std::clamp(bx_ - ox_, -3.4f, 3.4f);
    ox_ = std::clamp(ox_, 23.0f, 137.0f);

    bool serving = serve_timer_ > 0;
    if (serve_timer_ > 0) --serve_timer_;
    bool do_serve = serving && serve_timer_ == 0;
    if (do_serve) {
      bx_ = 80.0f;
      by_ = 115.0f;
      bvx_ = rng.uniform(-2.0f, 2.0f);
      bvy_ = serve_to_player_ ? 2.6f : -2.6f;
    }
    bool live = !serving || do_serve;
    if (live) {
      bx_ += bvx_;
      by_ += bvy_;
    }
    if (bx_ < 16.0f || bx_ > 144.0f) bvx_ = -bvx_;
    bx_ = std::clamp(bx_, 16.0f, 144.0f);

    if (live && by_ >= 176.0f && by_ <= 185.0f && std::fabs(bx_ - px_) <= 9.0f
        && bvy_ > 0) {
      bvx_ = std::clamp(bvx_ + 2.2f * (bx_ - px_) / 7.0f, -3.2f, 3.2f);
      bvy_ = -2.6f;
    }
    if (live && by_ <= 55.0f && by_ >= 46.0f && bvy_ < 0) {
      bool aligned = std::fabs(bx_ - ox_) <= 9.0f;
      bool fumble = std::fabs(bvx_) > 1.8f &&
                    rng.uniform(0.0f, 1.0f) < 0.04f;
      if (aligned && !fumble) {
        bvx_ = std::clamp(bvx_ + 2.0f * (bx_ - ox_) / 7.0f, -3.2f, 3.2f);
        bvy_ = 2.6f;
      }
    }

    float reward = 0.0f;
    bool opp_point = live && by_ > 190.0f;
    bool my_point = live && by_ < 40.0f;
    if (opp_point || my_point) {
      reward = my_point ? 1.0f : -1.0f;
      ++points_;
      serve_timer_ = 40;
      serve_to_player_ = my_point;
      bvx_ = bvy_ = 0.0f;
      bx_ = 80.0f;
      by_ = 115.0f;
    }
    *done = points_ >= 24 || frame_ >= 20000;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 40, 190, 16, 144, 80);  // court
    draw_rect(o, 114, 117, 16, 144, 220);  // net
    draw_rect(o, 48, 53, ox_ - 7, ox_ + 7, 150);
    draw_rect(o, 178, 183, px_ - 7, px_ + 7, 200);
    if (serve_timer_ == 0)
      draw_rect(o, by_ - 2, by_ + 2, bx_ - 2, bx_ + 2, 250);
    draw_rect(o, 20, 26, 16, 16.0f + 4 * points_, 240);
  }

 private:
  float px_, ox_, bx_, by_, bvx_, bvy_;
  int serve_timer_, points_, frame_;
  bool serve_to_player_;
};

// -------------------------------------------------------------- gopher ----
// Same dynamics as the JAX-native game (games/gopher.py): 16 ground
// cells, gopher digs toward carrots, +20 hole fills / +80 bonks, episode
// ends when all three carrots are gone.
class Gopher : public Game {
 public:
  int num_actions() const override { return 8; }

  void reset(Rng& rng) override {
    (void)rng;
    fx_ = 80.0f;
    for (int i = 0; i < 16; ++i) holes_[i] = 0;
    gcell_ = 0;
    popped_ = 0;
    for (int i = 0; i < 3; ++i) carrots_[i] = true;
    frame_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    ++frame_;
    static const bool kFire[8] = {0, 1, 0, 0, 0, 1, 1, 1};
    static const bool kLeft[8] = {0, 0, 0, 0, 1, 0, 0, 1};
    static const bool kRight[8] = {0, 0, 0, 1, 0, 0, 1, 0};
    bool fire = kFire[action];
    if (kLeft[action]) fx_ -= 2.2f;
    if (kRight[action]) fx_ += 2.2f;
    fx_ = std::clamp(fx_, 5.0f, 155.0f);
    int fcell = std::clamp(int(fx_ / 10.0f), 0, 15);

    float reward = 0.0f;
    bool bonk = fire && popped_ > 0 && gcell_ == fcell;
    if (bonk) {
      reward += 80.0f;
      gcell_ = rng.bernoulli() ? 0 : 15;
      popped_ = 0;
    } else if (fire && holes_[fcell] > 0) {
      reward += 20.0f;
      holes_[fcell] = 0;
    }

    static const int kCarrot[3] = {3, 8, 13};
    int target = -1, best = 999;
    for (int i = 0; i < 3; ++i) {
      if (!carrots_[i]) continue;
      int d = std::abs(kCarrot[i] - gcell_);
      if (d < best) { best = d; target = i; }
    }
    bool tick = frame_ % 26 == 0 && !bonk;
    if (tick && target >= 0) {
      int dir = kCarrot[target] > gcell_ ? 1 : (kCarrot[target] < gcell_ ? -1 : 0);
      bool at_target = dir == 0;
      if (!at_target) gcell_ = std::clamp(gcell_ + dir, 0, 15);
      holes_[gcell_] = std::min(holes_[gcell_] + 1, 3);
      if (at_target && holes_[gcell_] >= 3 && carrots_[target]) {
        carrots_[target] = false;
        gcell_ = rng.bernoulli() ? 0 : 15;
      }
    }

    if (frame_ % 160 == 0 && !bonk) popped_ = 40;
    else if (popped_ > 0) --popped_;

    bool any = carrots_[0] || carrots_[1] || carrots_[2];
    *done = !any || frame_ >= 20000;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 150, 210, 0, 160, 100);  // ground
    for (int c = 0; c < 16; ++c)
      if (holes_[c] > 0)
        draw_rect(o, 150, 150.0f + 6 * std::min(holes_[c], 3),
                  c * 10 + 1, c * 10 + 9, 40);
    static const int kCarrot[3] = {3, 8, 13};
    for (int i = 0; i < 3; ++i)
      if (carrots_[i])
        draw_rect(o, 136, 150, kCarrot[i] * 10 + 2, kCarrot[i] * 10 + 8, 200);
    float gx = gcell_ * 10 + 5;
    if (popped_ > 0) draw_rect(o, 138, 150, gx - 5, gx + 5, 160);
    else draw_rect(o, 170, 180, gx - 5, gx + 5, 130);
    draw_rect(o, 120, 150, fx_ - 5, fx_ + 5, 250);
  }

 private:
  float fx_;
  int holes_[16], gcell_, popped_, frame_;
  bool carrots_[3];
};

// -------------------------------------------------------- demon attack ----
// Mirrors dqn_zoo_tpu/envs/games/demon_attack.py: three weaving demons in
// fixed hover bands drop bombs; kills pay wave-scaled bounty; 4 lives.
class DemonAttack : public Game {
 public:
  int num_actions() const override { return 6; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    px_ = rng.uniform(8.0f, 152.0f - 10);
    for (int i = 0; i < 3; ++i) {
      dx_[i] = rng.uniform(8.0f, 152.0f - 8);
      dd_[i] = rng.bernoulli() ? 1.0f : -1.0f;
      dlive_[i] = true;
      ddelay_[i] = 0;
      bx_[i] = by_[i] = 0;
      blive_[i] = false;
    }
    sx_ = sy_ = 0;
    slive_ = false;
    lives_ = 4;
    wave_ = kills_ = pause_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    bool right = action == 2 || action == 4;
    bool left = action == 3 || action == 5;
    bool fire = action == 1 || action == 4 || action == 5;
    px_ += right ? 3.0f : (left ? -3.0f : 0.0f);
    px_ = std::clamp(px_, 8.0f, 152.0f - 10);

    float speed = 1.2f + 0.3f * wave_;
    float reward = 0.0f;
    static const float kBandY[3] = {60, 90, 120};
    for (int i = 0; i < 3; ++i) {
      if (dlive_[i]) {
        dx_[i] += dd_[i] * speed;
        if (dx_[i] < 8 || dx_[i] > 152 - 8 || rng.uniform(0, 1) < 0.02f)
          dd_[i] = -dd_[i];
        dx_[i] = std::clamp(dx_[i], 8.0f, 152.0f - 8);
      } else if (--ddelay_[i] <= 0) {
        dlive_[i] = true;
        dx_[i] = rng.uniform(8.0f, 152.0f - 8);
      }
    }

    if (fire && !slive_) { sx_ = px_ + 5; sy_ = 178; slive_ = true; }
    if (slive_) {
      sy_ -= 8.0f;
      if (sy_ < 40) slive_ = false;
      for (int i = 2; i >= 0 && slive_; --i) {  // lowest band wins
        if (dlive_[i] && sx_ + 2 >= dx_[i] && sx_ <= dx_[i] + 8 &&
            sy_ <= kBandY[i] + 8 && sy_ + 6 >= kBandY[i]) {
          dlive_[i] = false;
          ddelay_[i] = 40;
          slive_ = false;
          reward += 10.0f * (wave_ + 1);
          if (++kills_ >= 9) { kills_ = 0; ++wave_; }
        }
      }
    }

    bool hit = false;
    for (int i = 0; i < 3; ++i) {
      if (dlive_[i] && !blive_[i] && rng.uniform(0, 1) < 0.022f) {
        bx_[i] = dx_[i] + 4;
        by_[i] = kBandY[i] + 8;
        blive_[i] = true;
      }
      if (blive_[i]) {
        by_[i] += 3.0f;
        if (by_[i] > 200) blive_[i] = false;
        if (bx_[i] + 2 >= px_ && bx_[i] <= px_ + 10 && by_[i] + 6 >= 180 &&
            by_[i] <= 188)
          hit = true;
      }
    }
    if (pause_ > 0) { --pause_; hit = false; }
    if (hit) {
      for (int i = 0; i < 3; ++i) blive_[i] = false;
      pause_ = 30;
      if (--lives_ <= 0) *done = true;
      else *life_lost = true;
    }
    return reward;
  }

  void render(uint8_t* o) const override {
    static const float kBandY[3] = {60, 90, 120};
    draw_rect(o, 190, 210, 0, 160, 90);  // ice field
    for (int i = 0; i < 3; ++i) {
      if (dlive_[i]) draw_rect(o, kBandY[i], kBandY[i] + 8, dx_[i],
                               dx_[i] + 8, 170);
      if (blive_[i]) draw_rect(o, by_[i], by_[i] + 6, bx_[i], bx_[i] + 2,
                               150);
    }
    if (slive_) draw_rect(o, sy_, sy_ + 6, sx_, sx_ + 2, 236);
    draw_rect(o, 180, 188, px_, px_ + 10, 130);
  }

 private:
  float px_, dx_[3], dd_[3], bx_[3], by_[3], sx_, sy_;
  bool dlive_[3], blive_[3], slive_;
  int ddelay_[3], lives_, wave_, kills_, pause_;
};

// ------------------------------------------------------------- phoenix ----
// Mirrors dqn_zoo_tpu/envs/games/phoenix.py: eight weaving birds in two
// ranks, homing dives, deployable shield (DOWN), 5 lives.
class Phoenix : public Game {
 public:
  int num_actions() const override { return 8; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    px_ = rng.uniform(8.0f, 152.0f - 10);
    for (int i = 0; i < 8; ++i) {
      bx_[i] = rng.uniform(8.0f, 152.0f - 8);
      by_[i] = rank_y(i);
      bd_[i] = rng.bernoulli() ? 1.0f : -1.0f;
      blive_[i] = true;
      bdive_[i] = false;
      bdelay_[i] = 0;
    }
    sx_ = sy_ = 0;
    slive_ = false;
    shield_ = shield_cd_ = 0;
    lives_ = 5;
    wave_ = pause_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    bool right = action == 2 || action == 5;
    bool left = action == 3 || action == 6;
    bool fire = action == 1 || action == 5 || action == 6 || action == 7;
    bool shield_btn = action == 4 || action == 7;
    px_ += right ? 3.0f : (left ? -3.0f : 0.0f);
    px_ = std::clamp(px_, 8.0f, 152.0f - 10);

    if (shield_btn && shield_cd_ <= 0 && shield_ <= 0) {
      shield_ = 24;
      shield_cd_ = 40;
    } else {
      if (shield_ > 0) --shield_;
      if (shield_cd_ > 0) --shield_cd_;
    }
    bool shield_up = shield_ > 0;

    float speed = 1.0f + 0.25f * wave_;
    float reward = 0.0f;
    for (int i = 0; i < 8; ++i) {
      if (!blive_[i]) {
        if (--bdelay_[i] <= 0) {
          blive_[i] = true;
          bdive_[i] = false;
          bx_[i] = rng.uniform(8.0f, 152.0f - 8);
          by_[i] = rank_y(i);
        }
        continue;
      }
      if (!bdive_[i] && rng.uniform(0, 1) < 0.012f) bdive_[i] = true;
      if (bdive_[i]) {
        bx_[i] += std::clamp(px_ - bx_[i], -2.0f, 2.0f);
        by_[i] += 3.2f;
        if (by_[i] > 200) { bdive_[i] = false; by_[i] = rank_y(i); }
      } else {
        bx_[i] += bd_[i] * speed;
        if (bx_[i] < 8 || bx_[i] > 152 - 8 || rng.uniform(0, 1) < 0.03f)
          bd_[i] = -bd_[i];
        bx_[i] = std::clamp(bx_[i], 8.0f, 152.0f - 8);
        by_[i] = rank_y(i);
      }
    }

    if (fire && !slive_) { sx_ = px_ + 5; sy_ = 178; slive_ = true; }
    if (slive_) {
      sy_ -= 7.0f;
      if (sy_ < 40) slive_ = false;
      for (int i = 7; i >= 0 && slive_; --i) {
        if (blive_[i] && sx_ + 2 >= bx_[i] && sx_ <= bx_[i] + 8 &&
            sy_ <= by_[i] + 6 && sy_ + 6 >= by_[i]) {
          reward += bdive_[i] ? 40.0f : (i < 4 ? 25.0f : 12.0f);
          blive_[i] = false;
          bdelay_[i] = 45;
          slive_ = false;
        }
      }
    }

    bool crash = false;
    for (int i = 0; i < 8; ++i) {
      if (!blive_[i] || !bdive_[i]) continue;
      bool contact = bx_[i] + 8 >= px_ && bx_[i] <= px_ + 10 &&
                     by_[i] + 6 >= 180 && by_[i] <= 188;
      if (!contact) continue;
      if (shield_up) {
        reward += 40.0f;
        blive_[i] = false;
        bdelay_[i] = 45;
      } else {
        crash = true;
      }
    }
    if (pause_ > 0) { --pause_; crash = false; }
    if (crash) {
      pause_ = 30;
      if (--lives_ <= 0) *done = true;
      else *life_lost = true;
    }
    bool any = false;
    for (int i = 0; i < 8; ++i) any |= blive_[i];
    if (!any) ++wave_;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 40, 42, 0, 160, 70);  // horizon band
    for (int i = 0; i < 8; ++i)
      if (blive_[i]) draw_rect(o, by_[i], by_[i] + 6, bx_[i], bx_[i] + 8,
                               190);
    if (slive_) draw_rect(o, sy_, sy_ + 6, sx_, sx_ + 2, 236);
    if (shield_ > 0) draw_rect(o, 174, 178, px_ - 2, px_ + 12, 150);
    draw_rect(o, 180, 188, px_, px_ + 10, 130);
  }

 private:
  static float rank_y(int i) { return i < 4 ? 56.0f : 76.0f; }
  float px_, bx_[8], by_[8], bd_[8], sx_, sy_;
  bool blive_[8], bdive_[8], slive_;
  int bdelay_[8], shield_, shield_cd_, lives_, wave_, pause_;
};

// ------------------------------------------------------------- assault ----
// Mirrors dqn_zoo_tpu/envs/games/assault.py: mothership deploys strafing
// drones; turret heat meter (overheat costs a life); 4 lives.
class Assault : public Game {
 public:
  int num_actions() const override { return 7; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    px_ = rng.uniform(8.0f, 152.0f - 10);
    mx_ = 70.0f;
    md_ = rng.bernoulli() ? 1.0f : -1.0f;
    mhp_ = 6;
    for (int i = 0; i < 3; ++i) {
      dlive_[i] = false;
      ddelay_[i] = 10 + 50 * i;
      dd_[i] = 1.0f;
      dx_[i] = dy_[i] = bx_[i] = by_[i] = 0;
      blive_[i] = false;
    }
    sx_ = sy_ = 0;
    slive_ = false;
    heat_ = 0;
    lives_ = 4;
    wave_ = pause_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    bool right = action == 3 || action == 5;
    bool left = action == 4 || action == 6;
    bool fire = action == 1 || action == 2 || action == 5 || action == 6;
    px_ += right ? 3.0f : (left ? -3.0f : 0.0f);
    px_ = std::clamp(px_, 8.0f, 152.0f - 10);

    mx_ += md_ * (0.8f + 0.2f * wave_);
    if (mx_ < 8 || mx_ > 152 - 24) md_ = -md_;
    mx_ = std::clamp(mx_, 8.0f, 152.0f - 24);

    float speed = 1.4f + 0.3f * wave_;
    for (int i = 0; i < 3; ++i) {
      if (!dlive_[i]) {
        if (--ddelay_[i] <= 0) {
          dlive_[i] = true;
          dx_[i] = mx_ + 12;
          dy_[i] = 52.0f;
        }
        continue;
      }
      dx_[i] += dd_[i] * speed;
      if (dx_[i] < 8 || dx_[i] > 152 - 14 || rng.uniform(0, 1) < 0.02f)
        dd_[i] = -dd_[i];
      dx_[i] = std::clamp(dx_[i], 8.0f, 152.0f - 14);
      dy_[i] = std::min(dy_[i] + 0.55f, 180.0f - 7 - 2);
    }

    float reward = 0.0f;
    bool shot_spawn = fire && !slive_ && pause_ <= 0;
    if (shot_spawn) { sx_ = px_ + 5; sy_ = 178; slive_ = true; }
    heat_ = std::max(heat_ - 1, 0) + (shot_spawn ? 25 : 0);
    bool overheat = heat_ >= 100;
    if (overheat) heat_ = 0;

    if (slive_) {
      sy_ -= 7.0f;
      if (sy_ < 38) slive_ = false;
      for (int i = 2; i >= 0 && slive_; --i) {
        if (dlive_[i] && sx_ + 2 >= dx_[i] && sx_ <= dx_[i] + 14 &&
            sy_ <= dy_[i] + 7 && sy_ + 6 >= dy_[i]) {
          dlive_[i] = false;
          ddelay_[i] = 50;
          slive_ = false;
          reward += 21.0f;
        }
      }
      if (slive_ && sx_ + 2 >= mx_ && sx_ <= mx_ + 24 && sy_ <= 42 + 8 &&
          sy_ + 6 >= 42) {
        slive_ = false;
        if (--mhp_ <= 0) { reward += 150.0f; ++wave_; mhp_ = 6; }
      }
    }

    bool destroyed = overheat;
    for (int i = 0; i < 3; ++i) {
      if (dlive_[i] && !blive_[i] && rng.uniform(0, 1) < 0.012f) {
        bx_[i] = dx_[i] + 7;
        by_[i] = dy_[i] + 7;
        blive_[i] = true;
      }
      if (blive_[i]) {
        by_[i] += 2.8f;
        if (by_[i] > 200) blive_[i] = false;
        if (bx_[i] + 2 >= px_ && bx_[i] <= px_ + 10 && by_[i] + 6 >= 180 &&
            by_[i] <= 188)
          destroyed = true;
      }
      if (dlive_[i] && dx_[i] + 14 >= px_ && dx_[i] <= px_ + 10 &&
          dy_[i] + 7 >= 178)
        destroyed = true;
    }
    if (pause_ > 0) { --pause_; destroyed = false; }
    if (destroyed) {
      for (int i = 0; i < 3; ++i) blive_[i] = false;
      pause_ = 30;
      if (--lives_ <= 0) *done = true;
      else *life_lost = true;
    }
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 192, 196, 0, 160, 120);  // ground
    draw_rect(o, 42, 50, mx_, mx_ + 24, 160);  // mothership
    for (int i = 0; i < 3; ++i) {
      if (dlive_[i]) draw_rect(o, dy_[i], dy_[i] + 7, dx_[i], dx_[i] + 14,
                               190);
      if (blive_[i]) draw_rect(o, by_[i], by_[i] + 6, bx_[i], bx_[i] + 2,
                               150);
    }
    if (slive_) draw_rect(o, sy_, sy_ + 6, sx_, sx_ + 2, 236);
    draw_rect(o, 180, 188, px_, px_ + 10, 140);
    draw_rect(o, 200, 204, 10, 10 + heat_ * 1.4f, 110);  // heat bar
  }

 private:
  float px_, mx_, md_, dx_[3], dy_[3], dd_[3], bx_[3], by_[3], sx_, sy_;
  bool dlive_[3], blive_[3], slive_;
  int ddelay_[3], mhp_, heat_, lives_, wave_, pause_;
};

// ---------------------------------------------------------- ice hockey ----
// Mirrors dqn_zoo_tpu/envs/games/ice_hockey.py: 1-on-1 rink, carried puck,
// signed goals, fixed game clock, no lives.
class IceHockey : public Game {
 public:
  int num_actions() const override { return 18; }

  void reset(Rng& rng) override {
    px_ = 76; py_ = 150; ex_ = 76; ey_ = 66;
    kx_ = 78; ky_ = rng.uniform(100.0f, 120.0f);
    kvx_ = kvy_ = 0;
    carrier_ = 0;
    frame_ = faceoff_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    bool fire = action == 1 || action >= 10;
    int a = action >= 10 ? action - 8 : action;
    float dx = ((a == 3 || a == 6 || a == 8) ? 1.0f : 0.0f) -
               ((a == 4 || a == 7 || a == 9) ? 1.0f : 0.0f);
    float dy = ((a == 5 || a == 8 || a == 9) ? 1.0f : 0.0f) -
               ((a == 2 || a == 6 || a == 7) ? 1.0f : 0.0f);
    px_ = std::clamp(px_ + dx * 2.2f, 12.0f, 148.0f - 8);
    py_ = std::clamp(py_ + dy * 2.2f, 115.0f, 190.0f - 12);

    float tx = carrier_ == 1 ? 76.0f : kx_ - 4;
    float ty = carrier_ == 1 ? 48.0f : std::min(ky_, 103.0f);
    ex_ = std::clamp(ex_ + std::clamp(tx - ex_, -1.8f, 1.8f), 12.0f,
                     148.0f - 8);
    ey_ = std::clamp(ey_ + std::clamp(ty - ey_, -1.8f, 1.8f), 40.0f, 103.0f);

    if (faceoff_ > 0) --faceoff_;
    bool live = faceoff_ == 0;

    if (carrier_ == 1) { kx_ = px_ + 4; ky_ = py_ - 2; kvx_ = kvy_ = 0; }
    if (carrier_ == 2) { kx_ = ex_ + 4; ky_ = ey_ + 14; kvx_ = kvy_ = 0; }
    if (live && carrier_ == 0) { kx_ += kvx_; ky_ += kvy_; }
    if (kx_ < 12 || kx_ > 148 - 3) { kvx_ = -kvx_; }
    kvx_ *= 0.985f; kvy_ *= 0.985f;
    kx_ = std::clamp(kx_, 12.0f, 148.0f - 3);
    bool in_mouth = kx_ >= 62 && kx_ + 3 <= 98;
    if (!in_mouth && (ky_ < 40 || ky_ > 190 - 3)) kvy_ = -kvy_;
    if (!in_mouth) ky_ = std::clamp(ky_, 40.0f, 190.0f - 3);

    if (live && carrier_ == 0) {
      if (kx_ + 3 >= px_ && kx_ <= px_ + 8 && ky_ + 3 >= py_ &&
          ky_ <= py_ + 12)
        carrier_ = 1;
      else if (kx_ + 3 >= ex_ && kx_ <= ex_ + 8 && ky_ + 3 >= ey_ &&
               ky_ <= ey_ + 12)
        carrier_ = 2;
    }
    bool overlap = px_ + 8 >= ex_ && px_ <= ex_ + 8 && py_ <= ey_ + 14 &&
                   py_ + 12 >= ey_ - 2;
    if (overlap && carrier_ == 2) carrier_ = 1;

    float aim = rng.uniform(52.0f, 105.0f);
    if (carrier_ == 1 && fire) {
      kvx_ = std::clamp((aim - kx_) / std::max(ky_ - 40.0f, 1.0f) * 4.5f,
                        -3.0f, 3.0f);
      kvy_ = -4.5f;
      carrier_ = 0;
    } else if (carrier_ == 2 && rng.uniform(0, 1) < 0.0028f) {
      kvx_ = std::clamp((aim - kx_) / std::max(190.0f - ky_, 1.0f) * 4.5f,
                        -3.0f, 3.0f);
      kvy_ = 4.5f;
      carrier_ = 0;
    }

    float reward = 0.0f;
    bool pg = ky_ <= 39 && in_mouth;
    bool eg = ky_ >= 190 - 3 + 1 && in_mouth;
    if (pg) reward = 1.0f;
    if (eg) reward = -1.0f;
    if (pg || eg) {
      kx_ = 78; ky_ = 114; kvx_ = kvy_ = 0;
      carrier_ = 0;
      faceoff_ = 90;
    }
    if (++frame_ >= 12000) *done = true;
    return reward;
  }

  void render(uint8_t* o) const override {
    // draw_rect max-blends, so skaters/puck must sit ABOVE the rink luma
    // to be visible at all (the boxing invisible-opponent bug class —
    // caught for this game by tests/test_pixel_parity.py): dark rink,
    // bright entities, unlike the JAX renderer's overwrite compositing.
    draw_rect(o, 40, 190, 12, 148, 60);  // rink
    draw_rect(o, 114, 116, 12, 148, 90);  // center line
    draw_rect(o, 34, 40, 62, 98, 120);  // top goal
    draw_rect(o, 190, 196, 62, 98, 120);  // bottom goal
    draw_rect(o, ey_, ey_ + 12, ex_, ex_ + 8, 160);
    draw_rect(o, py_, py_ + 12, px_, px_ + 8, 200);
    draw_rect(o, ky_, ky_ + 3, kx_, kx_ + 3, 250);
  }

 private:
  float px_, py_, ex_, ey_, kx_, ky_, kvx_, kvy_;
  int carrier_, frame_, faceoff_;
};

// ------------------------------------------------------- crazy climber ----
// Mirrors dqn_zoo_tpu/envs/games/crazy_climber.py: 7-column window grid,
// shuttered windows block UP, falling pots knock the climber down; 5 lives.
class CrazyClimber : public Game {
 public:
  int num_actions() const override { return 9; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    col_ = rng.randint(0, 7);
    row_ = move_cd_ = 0;
    for (int c = 0; c < 7; ++c) phase_[c] = rng.randint(0, 180);
    for (int i = 0; i < 3; ++i) { plive_[i] = false; pcol_[i] = 0; py_[i] = 0; }
    lives_ = 5;
    building_ = frame_ = pause_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    bool up = action == 1 || action == 5 || action == 6;
    bool right = action == 2 || action == 5 || action == 7;
    bool left = action == 3 || action == 6 || action == 8;
    bool down = action == 4 || action == 7 || action == 8;

    float reward = 0.0f;
    bool can_move = move_cd_ <= 0;
    if (move_cd_ > 0) --move_cd_;
    int old_col = col_, old_row = row_;
    if (can_move) {
      col_ = std::clamp(col_ + (right ? 1 : 0) - (left ? 1 : 0), 0, 6);
      bool closed_above = shut(col_, row_ + 1);
      int dr = (up && !closed_above ? 1 : 0) - (down ? 1 : 0);
      row_ = std::clamp(row_ + dr, 0, 24);
      if (col_ != old_col || row_ != old_row) move_cd_ = 6;
      if (row_ > old_row) reward += 300.0f;
    }

    float speed = 2.6f + 0.4f * building_;
    bool knocked = false;
    for (int i = 0; i < 3; ++i) {
      if (!plive_[i] && rng.uniform(0, 1) < 0.02f) {
        plive_[i] = true;
        pcol_[i] = rng.uniform(0, 1) < 0.5f ? col_ : rng.randint(0, 7);
        py_[i] = 0;
      }
      if (plive_[i]) {
        py_[i] += speed;
        if (py_[i] > 210) plive_[i] = false;
        else if (pcol_[i] == col_ && py_[i] + 4 >= 150 && py_[i] <= 162) {
          plive_[i] = false;
          knocked = true;
        }
      }
    }
    if (pause_ > 0) { --pause_; knocked = false; }
    if (knocked) {
      pause_ = 40;
      row_ = std::max(row_ - 2, 0);
      if (--lives_ <= 0) *done = true;
      else *life_lost = true;
    }
    if (row_ >= 24) {
      reward += 2000.0f;
      ++building_;
      row_ = 0;
    }
    ++frame_;
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 20, 200, 18, 140, 80);  // building
    for (int vis = 0; vis < 10; ++vis) {
      int wrow = row_ + 4 - vis;
      float y0 = 150.0f - (4 - vis) * 14 - 10;
      if (wrow < 0 || wrow > 24) continue;
      for (int c = 0; c < 7; ++c) {
        float x0 = 26.0f + c * 16;
        draw_rect(o, y0, y0 + 10, x0, x0 + 14, shut(c, wrow) ? 50 : 210);
      }
    }
    for (int i = 0; i < 3; ++i)
      if (plive_[i])
        draw_rect(o, py_[i], py_[i] + 4, 26.0f + pcol_[i] * 16 + 5,
                  26.0f + pcol_[i] * 16 + 9, 160);
    float cx = 26.0f + col_ * 16 + 2;
    draw_rect(o, 150, 162, cx, cx + 10, 250);
  }

 private:
  bool shut(int c, int r) const {
    int ph = (frame_ + phase_[c] + r * 37) % 180;
    return ph >= 120;
  }
  int col_, row_, move_cd_, phase_[7], pcol_[3], lives_, building_, frame_,
      pause_;
  float py_[3];
  bool plive_[3];
};

// ---------------------------------------------------------- beam rider ----
// Mirrors dqn_zoo_tpu/envs/games/beam_rider.py: lane-locked ship on 5
// beams, saucers stream down, limited torpedoes, 3 lives.
class BeamRider : public Game {
 public:
  int num_actions() const override { return 9; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    beam_ = rng.randint(0, 5);
    hop_cd_ = 0;
    for (int i = 0; i < 3; ++i) slive_[i] = false;
    shot_live_ = false;
    torps_ = 3;
    lives_ = 3;
    sector_ = kills_ = pause_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    bool right = action == 3 || action == 5 || action == 7;
    bool left = action == 4 || action == 6 || action == 8;
    bool fire = action == 1 || action == 7 || action == 8;
    bool torp = action == 2 || action == 5 || action == 6;
    if (hop_cd_ > 0) --hop_cd_;
    if (hop_cd_ <= 0 && (right || left)) {
      int nb = std::clamp(beam_ + (right ? 1 : 0) - (left ? 1 : 0), 0, 4);
      if (nb != beam_) { beam_ = nb; hop_cd_ = 8; }
    }

    float speed = 1.1f + 0.25f * sector_;
    float reward = 0.0f;
    for (int i = 0; i < 3; ++i) {
      if (slive_[i]) {
        sy_[i] += speed;
        if (sy_[i] > 200) slive_[i] = false;
      } else if (rng.uniform(0, 1) < 0.025f) {
        slive_[i] = true;
        sbeam_[i] = rng.randint(0, 5);
        sy_[i] = 48.0f;
      }
    }

    if (fire && !shot_live_) {
      shot_live_ = true;
      shot_beam_ = beam_;
      shot_y_ = 178.0f;
    }
    if (shot_live_) {
      shot_y_ -= 6.0f;
      if (shot_y_ < 44) shot_live_ = false;
      for (int i = 2; i >= 0 && shot_live_; --i) {
        if (slive_[i] && sbeam_[i] == shot_beam_ && shot_y_ <= sy_[i] + 6 &&
            shot_y_ + 6 >= sy_[i]) {
          slive_[i] = false;
          shot_live_ = false;
          reward += 44.0f;
          ++kills_;
        }
      }
    }
    if (torp && torps_ > 0) {
      --torps_;
      for (int i = 0; i < 3; ++i)
        if (slive_[i] && sbeam_[i] == beam_) {
          slive_[i] = false;
          reward += 80.0f;
          ++kills_;
        }
    }

    bool crash = false;
    for (int i = 0; i < 3; ++i)
      if (slive_[i] && sbeam_[i] == beam_ && sy_[i] + 6 >= 180) {
        slive_[i] = false;
        crash = true;
      }
    if (pause_ > 0) { --pause_; crash = false; }
    if (crash) {
      pause_ = 35;
      if (--lives_ <= 0) *done = true;
      else *life_lost = true;
    }
    if (kills_ >= 15) { kills_ = 0; ++sector_; torps_ = 3; }
    return reward;
  }

  void render(uint8_t* o) const override {
    static const float kBx[5] = {24, 52, 80, 108, 136};
    for (int b = 0; b < 5; ++b) draw_rect(o, 48, 196, kBx[b] - 1,
                                          kBx[b] + 1, 70);
    for (int i = 0; i < 3; ++i)
      if (slive_[i])
        draw_rect(o, sy_[i], sy_[i] + 6, kBx[sbeam_[i]] - 6,
                  kBx[sbeam_[i]] + 6, 220);
    if (shot_live_)
      draw_rect(o, shot_y_, shot_y_ + 6, kBx[shot_beam_] - 1,
                kBx[shot_beam_] + 1, 250);
    draw_rect(o, 180, 188, kBx[beam_] - 7, kBx[beam_] + 7, 180);
    for (int i = 0; i < torps_; ++i)
      draw_rect(o, 36, 42, 8.0f + i * 8, 13.0f + i * 8, 140);
  }

 private:
  int beam_, hop_cd_, sbeam_[3], shot_beam_, torps_, lives_, sector_,
      kills_, pause_;
  float sy_[3], shot_y_;
  bool slive_[3], shot_live_;
};

// ---------------------------------------------------------- star gunner ----
// Mirrors dqn_zoo_tpu/envs/games/star_gunner.py: free-flying ship on the
// left half, raiders sweep in from the right with homing bolts; 5 lives.
class StarGunner : public Game {
 public:
  int num_actions() const override { return 18; }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    sx_ = 24.0f;
    sy_ = rng.uniform(60.0f, 166.0f);
    for (int i = 0; i < 3; ++i) {
      rlive_[i] = false;
      rdelay_[i] = 5 + 30 * i;
      rvy_[i] = 0;
      blive_[i] = false;
    }
    shot_live_ = false;
    lives_ = 5;
    kills_ = pause_ = 0;
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    *done = false;
    *life_lost = false;
    bool fire = action == 1 || action >= 10;
    int a = action >= 10 ? action - 8 : action;
    float dx = ((a == 3 || a == 6 || a == 8) ? 1.0f : 0.0f) -
               ((a == 4 || a == 7 || a == 9) ? 1.0f : 0.0f);
    float dy = ((a == 5 || a == 8 || a == 9) ? 1.0f : 0.0f) -
               ((a == 2 || a == 6 || a == 7) ? 1.0f : 0.0f);
    sx_ = std::clamp(sx_ + dx * 2.6f, 8.0f, 76.0f);
    sy_ = std::clamp(sy_ + dy * 2.6f, 40.0f, 196.0f - 8);

    float speed = 1.3f + 0.3f * (kills_ / 10);
    float reward = 0.0f;
    for (int i = 0; i < 3; ++i) {
      if (!rlive_[i]) {
        if (--rdelay_[i] <= 0) {
          rlive_[i] = true;
          rx_[i] = 152.0f;
          ry_[i] = rng.uniform(40.0f, 189.0f);
          rvy_[i] = 0;
        }
        continue;
      }
      float jink = std::clamp(sy_ - ry_[i], -1.0f, 1.0f) +
                   rng.uniform(-0.8f, 0.8f);
      rvy_[i] = 0.8f * rvy_[i] + 0.4f * jink;
      rx_[i] -= speed;
      ry_[i] = std::clamp(ry_[i] + rvy_[i], 40.0f, 189.0f);
    }

    if (fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = sx_ + 12;
      shot_y_ = sy_ + 4;
    }
    if (shot_live_) {
      shot_x_ += 7.0f;
      if (shot_x_ > 160) shot_live_ = false;
      for (int i = 0; i < 3 && shot_live_; ++i) {
        if (rlive_[i] && shot_x_ + 6 >= rx_[i] && shot_x_ <= rx_[i] + 10 &&
            shot_y_ >= ry_[i] && shot_y_ <= ry_[i] + 7) {
          rlive_[i] = false;
          rdelay_[i] = 70;
          shot_live_ = false;
          reward += 100.0f;
          ++kills_;
        }
      }
    }

    bool destroyed = false;
    for (int i = 0; i < 3; ++i) {
      if (rlive_[i] && !blive_[i] && rng.uniform(0, 1) < 0.02f) {
        blive_[i] = true;
        bx_[i] = rx_[i];
        by_[i] = ry_[i] + 3;
      }
      if (blive_[i]) {
        bx_[i] -= 2.4f;
        by_[i] += std::clamp(sy_ + 4 - by_[i], -1.2f, 1.2f);
        if (bx_[i] < 2) blive_[i] = false;
        else if (bx_[i] <= sx_ + 12 && bx_[i] + 3 >= sx_ &&
                 by_[i] + 3 >= sy_ && by_[i] <= sy_ + 8)
          destroyed = true;
      }
      if (rlive_[i]) {
        bool ram = rx_[i] <= sx_ + 12 && rx_[i] + 10 >= sx_ &&
                   ry_[i] + 7 >= sy_ && ry_[i] <= sy_ + 8;
        if (ram) { rlive_[i] = false; rdelay_[i] = 70; destroyed = true; }
        else if (rx_[i] < 8) { rlive_[i] = false; rdelay_[i] = 70; }
      }
    }
    if (pause_ > 0) { --pause_; destroyed = false; }
    if (destroyed) {
      for (int i = 0; i < 3; ++i) blive_[i] = false;
      pause_ = 35;
      if (--lives_ <= 0) *done = true;
      else *life_lost = true;
    }
    return reward;
  }

  void render(uint8_t* o) const override {
    draw_rect(o, 36, 38, 0, 160, 80);  // star band
    for (int i = 0; i < 3; ++i) {
      if (rlive_[i]) draw_rect(o, ry_[i], ry_[i] + 7, rx_[i], rx_[i] + 10,
                               200);
      if (blive_[i]) draw_rect(o, by_[i], by_[i] + 3, bx_[i], bx_[i] + 3,
                               160);
    }
    if (shot_live_)
      draw_rect(o, shot_y_ - 1, shot_y_ + 1, shot_x_, shot_x_ + 6, 250);
    draw_rect(o, sy_, sy_ + 8, sx_, sx_ + 12, 140);
  }

 private:
  float sx_, sy_, rx_[3], ry_[3], rvy_[3], bx_[3], by_[3], shot_x_, shot_y_;
  bool rlive_[3], blive_[3], shot_live_;
  int rdelay_[3], lives_, kills_, pause_;
};

#ifdef DZ_WITH_ALE
// ------------------------------------------------------------ ALE hook ----
// Full-fidelity backend for all 57 cartridges (parity with the reference's
// gym/atari-py path, gym_atari.py:26-61). Compiled in with -DDZ_WITH_ALE and
// linked against libale; ROMs are found under $DZ_ALE_ROM_DIR/<name>.bin.
// The farm's EnvInstance still owns the Atari protocol (action repeat,
// max-pool, noop starts, frame cap), so the ALE is driven one raw frame at a
// time with its own frame-skip/sticky-action machinery disabled.
#include <ale_interface.hpp>
#include <cstdlib>

class AleGame : public Game {
 public:
  explicit AleGame(const std::string& name) {
    ale_.setInt("frame_skip", 1);
    ale_.setFloat("repeat_action_probability", 0.0f);
    ale_.setBool("color_averaging", false);
    const char* dir = std::getenv("DZ_ALE_ROM_DIR");
    std::string rom = std::string(dir ? dir : ".") + "/" + name + ".bin";
    ale_.loadROM(rom);
    actions_ = ale_.getMinimalActionSet();
    start_lives_ = ale_.lives();
  }

  int num_actions() const override { return int(actions_.size()); }
  int lives() const override { return lives_; }

  void reset(Rng& rng) override {
    (void)rng;  // the ALE owns its episode RNG (system reset)
    ale_.reset_game();
    lives_ = ale_.lives();
  }

  float step(int action, Rng& rng, bool* done, bool* life_lost) override {
    (void)rng;
    float r = float(ale_.act(actions_[action]));
    int now = ale_.lives();
    *life_lost = now < lives_ && now > 0;
    lives_ = now;
    *done = ale_.game_over();
    return r;
  }

  void render(uint8_t* o) const override {
    // Grayscale 210x160 from the ALE, area-averaged to 84x84 (the built-in
    // games draw directly; full PIL-exact resize lives on the device path).
    std::vector<unsigned char> gray;
    ale_.getScreenGrayscale(gray);
    const int H = 210, W = 160;
    for (int y = 0; y < kObs; ++y) {
      int y0 = y * H / kObs, y1 = std::max(y0 + 1, (y + 1) * H / kObs);
      for (int x = 0; x < kObs; ++x) {
        int x0 = x * W / kObs, x1 = std::max(x0 + 1, (x + 1) * W / kObs);
        int sum = 0;
        for (int yy = y0; yy < y1; ++yy)
          for (int xx = x0; xx < x1; ++xx) sum += gray[yy * W + xx];
        o[y * kObs + x] = uint8_t(sum / ((y1 - y0) * (x1 - x0)));
      }
    }
  }

 private:
  mutable ale::ALEInterface ale_;
  ale::ActionVect actions_;
  int lives_ = 0, start_lives_ = 0;
};
#endif  // DZ_WITH_ALE

std::unique_ptr<Game> make_game(const std::string& name) {
  if (name == "pong") return std::make_unique<Pong>();
  if (name == "breakout") return std::make_unique<Breakout>();
  if (name == "catch") return std::make_unique<Catch>();
  if (name == "space_invaders") return std::make_unique<SpaceInvaders>();
  if (name == "freeway") return std::make_unique<Freeway>();
  if (name == "seaquest") return std::make_unique<Seaquest>();
  if (name == "asterix") return std::make_unique<Asterix>();
  if (name == "atlantis") return std::make_unique<Atlantis>();
  if (name == "skiing") return std::make_unique<Skiing>();
  if (name == "boxing") return std::make_unique<Boxing>();
  if (name == "enduro") return std::make_unique<Enduro>();
  if (name == "ms_pacman") return std::make_unique<MsPacman>();
  if (name == "qbert") return std::make_unique<Qbert>();
  if (name == "zaxxon") return std::make_unique<Zaxxon>();
  if (name == "bowling") return std::make_unique<Bowling>();
  if (name == "fishing_derby") return std::make_unique<FishingDerby>();
  if (name == "tennis") return std::make_unique<Tennis>();
  if (name == "gopher") return std::make_unique<Gopher>();
  if (name == "demon_attack") return std::make_unique<DemonAttack>();
  if (name == "phoenix") return std::make_unique<Phoenix>();
  if (name == "assault") return std::make_unique<Assault>();
  if (name == "ice_hockey") return std::make_unique<IceHockey>();
  if (name == "crazy_climber") return std::make_unique<CrazyClimber>();
  if (name == "beam_rider") return std::make_unique<BeamRider>();
  if (name == "star_gunner") return std::make_unique<StarGunner>();
#ifdef DZ_WITH_ALE
  try {
    return std::make_unique<AleGame>(name);
  } catch (...) {
    return nullptr;  // ROM missing/unloadable → same contract as unknown
  }
#endif
  return nullptr;
}

// ----------------------------------------------------------------- env ----
// One env instance: applies the Atari protocol around a Game (action repeat
// with masked post-terminal frames, max-pool of the last two frames, noop
// starts, frame cap truncation, auto-reset).
class EnvInstance {
 public:
  EnvInstance(const std::string& game, uint64_t seed, int max_noops,
              int action_repeat, int frame_cap)
      : game_(make_game(game)), rng_(seed), max_noops_(max_noops),
        repeat_(action_repeat), frame_cap_(frame_cap) {
    needs_reset_ = true;
  }

  int num_actions() const { return game_->num_actions(); }

  void agent_step(int action, uint8_t* obs84, float* reward, float* discount,
                  uint8_t* flags, int32_t* lives, int32_t* frames) {
    std::memset(obs84, 0, kObs * kObs);
    if (needs_reset_) {
      game_->reset(rng_);
      int noops = rng_.randint(1, max_noops_ + 1);
      bool done = false, ll = false;
      for (int i = 0; i < noops && !done; ++i) game_->step(0, rng_, &done, &ll);
      game_->render(obs84);
      *reward = 0.0f;
      *discount = 1.0f;
      *flags = 1;  // FIRST
      *lives = game_->lives();
      *frames = 1;
      episode_frames_ = 1;
      needs_reset_ = false;
      return;
    }
    uint8_t penult[kObs * kObs];
    std::memset(penult, 0, sizeof(penult));
    bool done = false;
    float r_sum = 0.0f;
    float disc = 1.0f;
    int used = 0;
    for (int m = 0; m < repeat_ && !done; ++m) {
      bool ll = false;
      r_sum += game_->step(action, rng_, &done, &ll);
      if (ll) disc = 0.0f;
      ++used;
      if (m == repeat_ - 2) game_->render(penult);
      if (m == repeat_ - 1) game_->render(obs84);
    }
    // max-pool penult/last (either may be zeros at episode boundaries)
    for (int i = 0; i < kObs * kObs; ++i)
      obs84[i] = std::max(obs84[i], penult[i]);
    episode_frames_ += used;
    bool truncated = !done && frame_cap_ > 0 && episode_frames_ >= frame_cap_;
    if (done) disc = 0.0f;
    *reward = r_sum;
    *discount = disc;
    *flags = uint8_t((done || truncated ? 2 : 0) | (truncated ? 4 : 0));
    *lives = game_->lives();
    *frames = used;
    if (done || truncated) needs_reset_ = true;
  }

 private:
  std::unique_ptr<Game> game_;
  Rng rng_;
  int max_noops_, repeat_, frame_cap_;
  int episode_frames_ = 0;
  bool needs_reset_;
};

}  // namespace

// ---------------------------------------------------------------- farm ----
struct DzFarm {
  std::vector<std::unique_ptr<EnvInstance>> envs;
  std::vector<std::thread> workers;
  // per-step shared pointers
  const int32_t* actions = nullptr;
  uint8_t* obs = nullptr;
  float* rewards = nullptr;
  float* discounts = nullptr;
  uint8_t* flags = nullptr;
  int32_t* lives = nullptr;
  int32_t* frames = nullptr;
  std::atomic<int> next{0};
  std::atomic<int> pending{0};
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  bool work_ready = false, shutdown = false;
  int generation = 0;

  void worker_loop() {
    int seen_gen = 0;
    while (true) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return shutdown || generation != seen_gen; });
        if (shutdown) return;
        seen_gen = generation;
      }
      int n = int(envs.size());
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
        envs[i]->agent_step(actions[i], obs + size_t(i) * kObs * kObs,
                            rewards + i, discounts + i, flags + i, lives + i,
                            frames + i);
        if (pending.fetch_sub(1) == 1) {
          std::lock_guard<std::mutex> lk(mu);
          cv_done.notify_one();
        }
      }
    }
  }
};

extern "C" {

DzFarm* dz_create(const char* game, int num_envs, uint64_t seed,
                  int num_threads, int max_noops, int action_repeat,
                  int episode_frame_cap) {
  if (!make_game(game)) return nullptr;
  auto* farm = new DzFarm();
  farm->envs.reserve(num_envs);
  for (int i = 0; i < num_envs; ++i)
    farm->envs.push_back(std::make_unique<EnvInstance>(
        game, seed * 0x9e3779b9u + i, max_noops, action_repeat,
        episode_frame_cap));
  int threads = num_threads > 0
                    ? num_threads
                    : std::max(1u, std::thread::hardware_concurrency());
  threads = std::min<int>(threads, num_envs);
  for (int t = 0; t < threads; ++t)
    farm->workers.emplace_back([farm] { farm->worker_loop(); });
  return farm;
}

void dz_destroy(DzFarm* farm) {
  {
    std::lock_guard<std::mutex> lk(farm->mu);
    farm->shutdown = true;
  }
  farm->cv_work.notify_all();
  for (auto& w : farm->workers) w.join();
  delete farm;
}

int dz_num_actions(const DzFarm* farm) {
  return farm->envs[0]->num_actions();
}

void dz_step(DzFarm* farm, const int32_t* actions, uint8_t* obs84,
             float* rewards, float* discounts, uint8_t* flags,
             int32_t* lives, int32_t* frames) {
  farm->actions = actions;
  farm->obs = obs84;
  farm->rewards = rewards;
  farm->discounts = discounts;
  farm->flags = flags;
  farm->lives = lives;
  farm->frames = frames;
  farm->next.store(0);
  farm->pending.store(int(farm->envs.size()));
  {
    std::lock_guard<std::mutex> lk(farm->mu);
    ++farm->generation;
  }
  farm->cv_work.notify_all();
  std::unique_lock<std::mutex> lk(farm->mu);
  farm->cv_done.wait(lk, [&] { return farm->pending.load() == 0; });
}

}  // extern "C"
