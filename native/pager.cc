// Refcounted page allocator for the paged compressed KV cache.
//
// The reference has no paging (survey §2.2: caches grow by torch.cat); this
// is new TPU-serving infrastructure: gear_tpu/paged.py holds the device-side
// page pool, and this allocator owns the host-side free list + refcounts
// (refcount > 1 = pages shared between sequences, e.g. a common prompt
// prefix). C ABI for ctypes binding; no exceptions across the boundary.
//
// Build: make -C native   ->  libgearpager.so

#include <cstdint>
#include <mutex>
#include <vector>

namespace {

struct Pager {
  std::mutex mu;
  std::vector<int32_t> refs;       // refcount per page; 0 = free
  std::vector<int32_t> free_list;  // stack of free page ids

  explicit Pager(int n) : refs(n, 0) {
    free_list.reserve(n);
    for (int i = n - 1; i >= 0; --i) free_list.push_back(i);
  }
};

}  // namespace

extern "C" {

void* gear_pager_create(int n_pages) {
  if (n_pages <= 0) return nullptr;
  return new Pager(n_pages);
}

void gear_pager_destroy(void* h) { delete static_cast<Pager*>(h); }

// -> page id, or -1 when exhausted.
int gear_pager_alloc(void* h) {
  auto* p = static_cast<Pager*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  if (p->free_list.empty()) return -1;
  int id = p->free_list.back();
  p->free_list.pop_back();
  p->refs[id] = 1;
  return id;
}

// Increment refcount (shared prefix). -> new count, or -1 on a free/bad page.
int gear_pager_retain(void* h, int id) {
  auto* p = static_cast<Pager*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  if (id < 0 || id >= (int)p->refs.size() || p->refs[id] <= 0) return -1;
  return ++p->refs[id];
}

// Decrement refcount; page returns to the free list at zero. -> new count.
int gear_pager_release(void* h, int id) {
  auto* p = static_cast<Pager*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  if (id < 0 || id >= (int)p->refs.size() || p->refs[id] <= 0) return -1;
  int c = --p->refs[id];
  if (c == 0) p->free_list.push_back(id);
  return c;
}

int gear_pager_free_count(void* h) {
  auto* p = static_cast<Pager*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  return (int)p->free_list.size();
}

}  // extern "C"
