// Batched environment farm: C ABI for the dqn_zoo_tpu host-env runtime.
//
// The reference delegates all native work to the ALE via atari-py
// (gym_atari.py:26-61); this library is our equivalent native subsystem: a
// thread-pooled farm of game instances stepped in lockstep, producing
// Atari-protocol observations (action repeat, max-pool, grayscale 84x84,
// noop starts, life-loss flags, frame caps) ready for device upload.
//
// Backends: built-in C++ games (pong/breakout/catch/space_invaders/freeway
// — same rules and step order as the JAX versions in dqn_zoo_tpu/envs/games;
// RNG draws are structured identically but the bit streams differ, so
// trajectories match in distribution, not bitwise); an ALE backend hook
// compiles in when DZ_WITH_ALE is defined (not available in this image).

#ifndef DZ_ENV_H_
#define DZ_ENV_H_

#include <cstdint>

extern "C" {

typedef struct DzFarm DzFarm;

// Creates a farm of `num_envs` instances of `game` ("pong", "breakout", "catch",
// "space_invaders", "freeway"), stepped by `num_threads` workers (0 = hardware concurrency).
// Returns nullptr on unknown game.
DzFarm* dz_create(const char* game, int num_envs, uint64_t seed,
                  int num_threads, int max_noops, int action_repeat,
                  int episode_frame_cap);

void dz_destroy(DzFarm* farm);

int dz_num_actions(const DzFarm* farm);

// Steps every env one agent-step (action_repeat raw frames, stopping early
// at episode end; auto-reset with noop burn emits a FIRST step).
// Output buffers are caller-allocated:
//   obs84:     num_envs * 84 * 84 uint8   (max-pooled, grayscaled, resized)
//   rewards:   num_envs float             (raw group sum, unclipped)
//   discounts: num_envs float             (group product; life-loss -> 0)
//   flags:     num_envs uint8             (bit0 FIRST, bit1 LAST, bit2 TRUNC)
//   lives:     num_envs int32
//   frames:    num_envs int32             (raw frames consumed this step)
void dz_step(DzFarm* farm, const int32_t* actions, uint8_t* obs84,
             float* rewards, float* discounts, uint8_t* flags,
             int32_t* lives, int32_t* frames);

}  // extern "C"

#endif  // DZ_ENV_H_
