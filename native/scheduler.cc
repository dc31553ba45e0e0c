// gear_tpu native runtime: continuous-batching scheduler.
//
// Slot-based FCFS admission with token-budget accounting — the scheduling
// brain of gear_tpu/serving.py. Native C++ (the reference has no serving
// runtime at all; HF generate is batch-static, survey §1). The Python side
// owns the jitted TPU compute; this library owns the queueing decisions so
// the host-side hot loop does no Python-object churn.
//
// C ABI (ctypes):
//   gear_sched_create(n_slots) -> handle
//   gear_sched_destroy(h)
//   gear_sched_add(h, rid, prompt_len, max_new) -> 0 | -1 (queue full)
//   gear_sched_next_admission(h) -> rid | -1      (peek; needs a free slot)
//   gear_sched_admit(h, rid) -> slot | -1         (assign the free slot)
//   gear_sched_step(h, slot) -> remaining tokens  (one decode step done)
//   gear_sched_finish(h, slot) -> rid             (free the slot)
//   gear_sched_active(h) / gear_sched_waiting(h) / gear_sched_done(h)
//   gear_sched_slot_rid(h, slot) -> rid | -1
#include <cstddef>
#include <cstdint>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

struct Request {
  int64_t rid;
  int64_t prompt_len;
  int64_t max_new;
  int64_t generated = 0;
};

struct Scheduler {
  explicit Scheduler(int n) : slots(n, -1) {}
  std::deque<Request> waiting;
  std::unordered_map<int64_t, Request> active;  // rid -> request
  std::vector<int64_t> slots;                   // slot -> rid (-1 free)
  int64_t done = 0;
};

}  // namespace

extern "C" {

void* gear_sched_create(int n_slots) { return new Scheduler(n_slots); }

void gear_sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

int gear_sched_add(void* h, int64_t rid, int64_t prompt_len,
                   int64_t max_new) {
  auto* s = static_cast<Scheduler*>(h);
  if (prompt_len <= 0 || max_new <= 0) return -1;
  s->waiting.push_back({rid, prompt_len, max_new});
  return 0;
}

int64_t gear_sched_next_admission(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  if (s->waiting.empty()) return -1;
  for (int64_t rid : s->slots) {
    if (rid == -1) return s->waiting.front().rid;
  }
  return -1;  // no free slot
}

int gear_sched_admit(void* h, int64_t rid) {
  auto* s = static_cast<Scheduler*>(h);
  if (s->waiting.empty() || s->waiting.front().rid != rid) return -1;
  for (std::size_t i = 0; i < s->slots.size(); ++i) {
    if (s->slots[i] == -1) {
      Request r = s->waiting.front();
      s->waiting.pop_front();
      s->slots[i] = rid;
      s->active[rid] = r;
      return static_cast<int>(i);
    }
  }
  return -1;
}

int64_t gear_sched_step(void* h, int slot) {
  auto* s = static_cast<Scheduler*>(h);
  if (slot < 0 || slot >= static_cast<int>(s->slots.size())) return -1;
  int64_t rid = s->slots[slot];
  if (rid == -1) return -1;
  Request& r = s->active[rid];
  r.generated += 1;
  return r.max_new - r.generated;
}

// Preempt a running slot: free it and requeue the request at the FRONT of
// the waiting queue (it was admitted first; FCFS fairness) with its
// remaining token budget. `new_prompt_len` lets the caller fold already-
// generated tokens into the prompt (recompute-style preemption).
int64_t gear_sched_preempt(void* h, int slot, int64_t new_prompt_len) {
  auto* s = static_cast<Scheduler*>(h);
  if (slot < 0 || slot >= static_cast<int>(s->slots.size())) return -1;
  int64_t rid = s->slots[slot];
  if (rid == -1) return -1;
  Request r = s->active[rid];
  s->slots[slot] = -1;
  s->active.erase(rid);
  int64_t remaining = r.max_new - r.generated;
  if (remaining < 1) remaining = 1;
  s->waiting.push_front({rid, new_prompt_len, remaining});
  return rid;
}

int64_t gear_sched_finish(void* h, int slot) {
  auto* s = static_cast<Scheduler*>(h);
  if (slot < 0 || slot >= static_cast<int>(s->slots.size())) return -1;
  int64_t rid = s->slots[slot];
  if (rid == -1) return -1;
  s->slots[slot] = -1;
  s->active.erase(rid);
  s->done += 1;
  return rid;
}

int gear_sched_active(void* h) {
  return static_cast<int>(static_cast<Scheduler*>(h)->active.size());
}
int gear_sched_waiting(void* h) {
  return static_cast<int>(static_cast<Scheduler*>(h)->waiting.size());
}
int64_t gear_sched_done(void* h) {
  return static_cast<Scheduler*>(h)->done;
}
int64_t gear_sched_slot_rid(void* h, int slot) {
  auto* s = static_cast<Scheduler*>(h);
  if (slot < 0 || slot >= static_cast<int>(s->slots.size())) return -1;
  return s->slots[slot];
}

}  // extern "C"
