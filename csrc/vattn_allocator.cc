// Native KV-arena allocator for vattention_tpu.
//
// C++ port of the hot path of memory/allocator.py (the TPU re-design of
// vattention/vattention.cu:27-610): extent bookkeeping over a flat HBM
// arena -- in-place tail growth, new-extent placement, eviction-window
// coalescing, gap-distributing repack -- emitting ordered per-block
// relocation plans for the device copy kernel.  The Python allocator
// remains the reference implementation (tests compare the two
// behaviorally); this one removes the per-step host bookkeeping from the
// serving critical path at large arena sizes.
//
// C ABI (ctypes-consumed, see vattention_tpu/memory/native.py):
//   handle-based -- vattn_create() returns an instance handle passed as
//   the first argument to every call, so multiple engines (replicas,
//   A/B harnesses) coexist in one process.  The reference is a process
//   singleton (vattention/apis.h:1); instances are the TPU-side
//   generalization the multi-replica launcher needs.

#include <algorithm>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <numeric>
#include <vector>

namespace {

constexpr int kEagerNumSteps = 10;     // ref vattention.cu:486
constexpr int kEagerNumKvblocks = 2;   // ref vattention.cu:487

struct Move {
  int32_t src;
  int32_t dst;
};

struct Allocator {
  // geometry
  int64_t num_layers = 0, num_kv_heads = 0, head_size = 0;
  int64_t max_batch_size = 0, max_context_length = 0;
  int64_t dtype_bytes = 0, page_size = 0;
  bool megacache = false;
  int64_t max_segments = 8;
  int64_t block_tokens = 1;
  int64_t pages_per_kvblock = 2;
  int64_t max_blocks_per_req = 0;
  int64_t num_arena_blocks = 0;
  bool deferred_reclaim = true;

  // per-slot state
  std::vector<int64_t> seq_lens;
  std::vector<std::vector<std::pair<int64_t, int64_t>>> segs;  // (off, len)
  // arena state: -1 free, else owning slot
  std::vector<int32_t> owner;

  // current step's relocation plan
  std::vector<Move> plan;

  int64_t mapped(int64_t slot) const {
    int64_t n = 0;
    for (auto& s : segs[slot]) n += s.second;
    return n;
  }

  int64_t tokens_to_blocks(int64_t t) const {
    return (t + block_tokens - 1) / block_tokens;
  }

  int64_t free_blocks() const {
    int64_t n = 0;
    for (int32_t o : owner) n += (o == -1);
    return n;
  }

  int64_t overcommitted() const {
    int64_t n = 0;
    for (int64_t s = 0; s < max_batch_size; s++)
      n += mapped(s) - tokens_to_blocks(seq_lens[s]);
    return n;
  }

  bool active(int64_t s) const { return seq_lens[s] != 0; }

  // ---- free-run search (worst-fit spread, ref allocator.py) ----------
  int64_t find_free_run(int64_t n, bool spread) const {
    if (n <= 0) return -1;
    int64_t best_start = -1, best_len = -1;
    int64_t i = 0;
    while (i < num_arena_blocks) {
      if (owner[i] != -1) { i++; continue; }
      int64_t j = i;
      while (j < num_arena_blocks && owner[j] == -1) j++;
      int64_t len = j - i;
      if (len >= n) {
        if (spread ? (len > best_len)
                   : (best_len < 0 || len < best_len)) {
          best_len = len;
          best_start = i;
        }
      }
      i = j;
    }
    return best_start;
  }

  void claim(int64_t slot, int64_t start, int64_t n) {
    for (int64_t b = start; b < start + n; b++) {
      assert(owner[b] == -1);
      owner[b] = (int32_t)slot;
    }
  }

  void extend_last(int64_t slot, int64_t start, int64_t n) {
    auto& last = segs[slot].back();
    assert(last.first + last.second == start);
    claim(slot, start, n);
    last.second += n;
  }

  void open_segment(int64_t slot, int64_t start, int64_t n) {
    assert((int64_t)segs[slot].size() < max_segments);
    claim(slot, start, n);
    segs[slot].push_back({start, n});
  }

  void release_tail_block(int64_t slot) {
    auto& last = segs[slot].back();
    int64_t b = last.first + last.second - 1;
    assert(owner[b] == (int32_t)slot);
    owner[b] = -1;
    if (--last.second == 0) segs[slot].pop_back();
  }

  void release_some(int64_t slot, int64_t retain) {
    while (mapped(slot) > retain) release_tail_block(slot);
  }

  int64_t tail_room(int64_t slot) const {
    if (segs[slot].empty()) return 0;
    auto& last = segs[slot].back();
    int64_t t = last.first + last.second, n = 0;
    while (t + n < num_arena_blocks && owner[t + n] == -1) n++;
    return n;
  }

  // ---- reclamation (ref vattention.cu:420-469) -----------------------
  void reclaim_on_demand(int64_t need) {
    for (int64_t s = max_batch_size - 1; s >= 0; s--) {
      if (free_blocks() >= need) break;
      int64_t req = tokens_to_blocks(seq_lens[s]);
      if (mapped(s) > req) release_some(s, req);
    }
  }

  void reclaim_excluding(int64_t need, int64_t slot) {
    for (int retain_extra : {1, 0}) {
      for (int64_t s = max_batch_size - 1; s >= 0; s--) {
        if (s == slot || free_blocks() >= need) return;
        int64_t req = tokens_to_blocks(seq_lens[s]);
        if (mapped(s) > req + retain_extra)
          release_some(s, req + retain_extra);
      }
    }
  }

  void do_reclaim_pages() {
    if (deferred_reclaim) return;
    int64_t next_prefill = -1;
    for (int64_t s = 0; s < max_batch_size; s++)
      if (!active(s)) { next_prefill = s; break; }
    for (int64_t s = max_batch_size - 1; s >= 0; s--) {
      if (active(s) || s == next_prefill) continue;
      if (mapped(s) == 0) continue;
      release_tail_block(s);
      break;
    }
  }

  // ---- permutation routing (ref allocator.py _route_moves) -----------
  void route_moves(const std::vector<std::pair<int64_t, int64_t>>& moves) {
    std::vector<char> occupied(num_arena_blocks, 0);
    for (int64_t s = 0; s < max_batch_size; s++)
      for (auto& sg : segs[s])
        for (int64_t b = sg.first; b < sg.first + sg.second; b++)
          occupied[b] = 1;
    // pending: src -> dst
    std::vector<int64_t> dst_of(num_arena_blocks, -1);
    std::vector<int64_t> src_of(num_arena_blocks, -1);
    std::vector<char> wanted(num_arena_blocks, 0);
    int64_t pending = 0;
    for (auto& m : moves) {
      if (m.first == m.second) continue;
      dst_of[m.first] = m.second;
      src_of[m.second] = m.first;
      wanted[m.second] = 1;
      pending++;
    }
    std::vector<int64_t> ready;
    for (auto& m : moves)
      if (dst_of[m.first] >= 0 && !occupied[m.second])
        ready.push_back(m.first);
    while (pending > 0) {
      if (ready.empty()) {
        // break a cycle through a scratch block
        int64_t src = -1;
        for (int64_t b = 0; b < num_arena_blocks && src < 0; b++)
          if (dst_of[b] >= 0) src = b;
        int64_t scratch = -1;
        for (int64_t b = 0; b < num_arena_blocks && scratch < 0; b++)
          if (!occupied[b] && !wanted[b]) scratch = b;
        if (scratch < 0)
          for (int64_t b = 0; b < num_arena_blocks && scratch < 0; b++)
            if (!occupied[b]) scratch = b;
        assert(scratch >= 0);
        plan.push_back({(int32_t)src, (int32_t)scratch});
        int64_t d = dst_of[src];
        dst_of[src] = -1;
        occupied[src] = 0;
        occupied[scratch] = 1;
        dst_of[scratch] = d;
        src_of[d] = scratch;
        ready.clear();
        for (int64_t b = 0; b < num_arena_blocks; b++)
          if (dst_of[b] >= 0 && !occupied[dst_of[b]]) ready.push_back(b);
        continue;
      }
      int64_t src = ready.back();
      ready.pop_back();
      if (dst_of[src] < 0 || occupied[dst_of[src]]) continue;
      int64_t dst = dst_of[src];
      plan.push_back({(int32_t)src, (int32_t)dst});
      dst_of[src] = -1;
      src_of[dst] = -1;
      occupied[src] = 0;
      occupied[dst] = 1;
      pending--;
      if (src_of[src] >= 0 && dst_of[src_of[src]] == src)
        ready.push_back(src_of[src]);
    }
  }

  void apply_seg_moves(
      const std::vector<std::pair<std::pair<int64_t, int64_t>, int64_t>>&
          seg_moves) {
    // seg_moves: ((slot, seg_idx), new_offset)
    std::vector<std::pair<int64_t, int64_t>> moves;
    for (auto& sm : seg_moves) {
      auto [key, new_off] = sm;
      auto& sg = segs[key.first][key.second];
      for (int64_t k = 0; k < sg.second; k++)
        if (sg.first + k != new_off + k)
          moves.push_back({sg.first + k, new_off + k});
    }
    route_moves(moves);
    for (auto& sm : seg_moves) {
      auto& sg = segs[sm.first.first][sm.first.second];
      for (int64_t b = sg.first; b < sg.first + sg.second; b++)
        owner[b] = -1;
    }
    for (auto& sm : seg_moves) {
      auto& sg = segs[sm.first.first][sm.first.second];
      sg.first = sm.second;
      for (int64_t b = sg.first; b < sg.first + sg.second; b++)
        owner[b] = (int32_t)sm.first.first;
    }
  }

  // ---- eviction-window coalescing (ref allocator.py) -----------------
  bool window_layout(
      int64_t slot, int64_t i, int64_t n, int64_t* cost_out,
      std::vector<std::pair<std::pair<int64_t, int64_t>, int64_t>>* out) {
    if (i < 0 || i + n > num_arena_blocks) return false;
    // evicted: (slot, seg) of other slots intersecting the window
    std::vector<std::pair<int64_t, int64_t>> evicted;
    for (int64_t s = 0; s < max_batch_size; s++) {
      if (s == slot) continue;
      for (size_t si = 0; si < segs[s].size(); si++) {
        auto& sg = segs[s][si];
        if (sg.first < i + n && sg.first + sg.second > i)
          evicted.push_back({s, (int64_t)si});
      }
    }
    std::sort(evicted.begin(), evicted.end(),
              [&](auto& a, auto& b) {
                return segs[a.first][a.second].second >
                       segs[b.first][b.second].second;
              });
    int64_t cost = 0;
    for (auto& e : evicted) cost += segs[e.first][e.second].second;
    // free space outside the window with evicted extents removed
    std::vector<int32_t> tmp = owner;
    for (auto& e : evicted) {
      auto& sg = segs[e.first][e.second];
      for (int64_t b = sg.first; b < sg.first + sg.second; b++) tmp[b] = -1;
    }
    for (int64_t b = i; b < i + n; b++) tmp[b] = INT32_MAX;
    out->clear();
    for (auto& e : evicted) {
      int64_t m = segs[e.first][e.second].second;
      // best-fit within tmp
      int64_t best = -1, best_len = -1, p = 0;
      while (p < num_arena_blocks) {
        if (tmp[p] != -1) { p++; continue; }
        int64_t q = p;
        while (q < num_arena_blocks && tmp[q] == -1) q++;
        int64_t len = q - p;
        if (len >= m && (best_len < 0 || len < best_len)) {
          best_len = len;
          best = p;
        }
        p = q;
      }
      if (best < 0) return false;
      out->push_back({{e.first, e.second}, best});
      for (int64_t b = best; b < best + m; b++) tmp[b] = (int32_t)e.first;
    }
    *cost_out = cost;
    return true;
  }

  int64_t place_via_eviction(int64_t slot, int64_t n) {
    if (n > num_arena_blocks) return -1;
    // candidate windows: own first-extent offset + cheapest by live count
    std::vector<int64_t> cands;
    if (!segs[slot].empty()) cands.push_back(segs[slot][0].first);
    // sliding window live-other count
    std::vector<int64_t> live(num_arena_blocks + 1, 0);
    for (int64_t b = 0; b < num_arena_blocks; b++)
      live[b + 1] = live[b] + (owner[b] != -1 && owner[b] != slot);
    std::vector<std::pair<int64_t, int64_t>> win;  // (cost, start)
    for (int64_t i = 0; i + n <= num_arena_blocks; i++)
      win.push_back({live[i + n] - live[i], i});
    std::partial_sort(win.begin(),
                      win.begin() + std::min<size_t>(8, win.size()),
                      win.end());
    for (size_t k = 0; k < std::min<size_t>(8, win.size()); k++)
      cands.push_back(win[k].second);
    int64_t best_i = -1, best_cost = INT64_MAX;
    std::vector<std::pair<std::pair<int64_t, int64_t>, int64_t>> best_moves;
    for (int64_t i : cands) {
      int64_t cost;
      std::vector<std::pair<std::pair<int64_t, int64_t>, int64_t>> mv;
      if (!window_layout(slot, i, n, &cost, &mv)) continue;
      bool moves_self = !segs[slot].empty() && i != segs[slot][0].first;
      if (moves_self) cost += mapped(slot);
      if (cost < best_cost) {
        best_cost = cost;
        best_i = i;
        best_moves = mv;
      }
      if (cost == 0) break;
    }
    if (best_i < 0) return -1;
    apply_seg_moves(best_moves);
    return best_i;
  }

  void move_slot_to(int64_t slot, int64_t start) {
    // copy extents in token order into the reserved run at start
    std::vector<std::pair<int64_t, int64_t>> moves;
    int64_t dst = start, total = 0;
    for (auto& sg : segs[slot]) {
      for (int64_t k = 0; k < sg.second; k++) {
        if (sg.first + k != dst) moves.push_back({sg.first + k, dst});
        dst++;
      }
      total += sg.second;
    }
    route_moves(moves);
    for (auto& sg : segs[slot])
      for (int64_t b = sg.first; b < sg.first + sg.second; b++)
        owner[b] = -1;
    segs[slot].clear();
    segs[slot].push_back({start, total});
    for (int64_t b = start; b < start + total; b++)
      owner[b] = (int32_t)slot;
  }

  int64_t repack_with_gaps(int64_t slot, int64_t needed) {
    for (int64_t s = 0; s < max_batch_size; s++)
      if (!active(s) && mapped(s) > 0) release_some(s, 0);
    int64_t cur = mapped(slot);
    std::vector<int64_t> order;
    for (int64_t s = 0; s < max_batch_size; s++)
      if (!segs[s].empty() && s != slot) order.push_back(s);
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      return segs[a][0].first < segs[b][0].first;
    });
    int64_t total = std::max(needed, cur);
    for (int64_t s : order) total += mapped(s);
    int64_t leftover = num_arena_blocks - total;
    assert(leftover >= 0);
    int64_t n_runs = (int64_t)order.size() + 1;
    int64_t gap = (leftover / 2) / (n_runs + 1);
    // route all data into the new layout
    std::vector<std::pair<int64_t, int64_t>> moves;
    int64_t cursor = 0;
    std::vector<std::pair<int64_t, int64_t>> final_off;  // (slot, off)
    order.push_back(slot);
    for (int64_t s : order) {
      final_off.push_back({s, cursor});
      int64_t dst = cursor;
      for (auto& sg : segs[s])
        for (int64_t k = 0; k < sg.second; k++) {
          if (sg.first + k != dst) moves.push_back({sg.first + k, dst});
          dst++;
        }
      cursor += (s == slot ? std::max(needed, cur) : mapped(s)) + gap;
    }
    route_moves(moves);
    std::fill(owner.begin(), owner.end(), -1);
    int64_t slot_off = -1;
    for (auto& fo : final_off) {
      int64_t s = fo.first, off = fo.second;
      int64_t m = (s == slot) ? std::max(needed, cur) : mapped(s);
      if (s == slot) slot_off = off;
      int64_t old_m = mapped(s);
      segs[s].clear();
      int64_t seg_len = (s == slot) ? old_m : m;
      if (seg_len > 0) segs[s].push_back({off, seg_len});
      for (int64_t b = off; b < off + seg_len; b++) owner[b] = (int32_t)s;
    }
    // claim the growth for slot
    if (!segs[slot].empty()) {
      int64_t have = segs[slot][0].second;
      if (needed > have) {
        claim(slot, slot_off + have, needed - have);
        segs[slot][0].second = needed;
      }
    } else if (needed > 0) {
      open_segment(slot, slot_off, needed);
    }
    return slot_off;
  }

  void coalesce_and_grow(int64_t slot, int64_t num_blocks) {
    int64_t cur = mapped(slot);
    int64_t needed = cur + num_blocks;
    if (free_blocks() < num_blocks) reclaim_excluding(num_blocks + 1, slot);
    int64_t fr = free_blocks();
    int64_t headroom =
        std::min(cur, std::max<int64_t>(0, fr - num_blocks) / 2);
    int64_t want = std::min(needed + headroom, max_blocks_per_req);
    for (int64_t target : {want, needed}) {
      if (target < needed) continue;
      if (fr < target - cur) continue;
      int64_t start = place_via_eviction(slot, target);
      if (start >= 0) {
        if (cur > 0) {
          move_slot_to(slot, start);
          extend_last(slot, start + cur, target - cur);
        } else {
          open_segment(slot, start, target);
        }
        return;
      }
      if (target == needed) break;
    }
    if (free_blocks() >= num_blocks) {
      repack_with_gaps(slot, needed);
      return;
    }
    fprintf(stderr, "***** OOM on demand: not enough free pages *****\n");
    abort();
  }

  // ---- growth (ref grow_kvcache_phys) --------------------------------
  int64_t grow(int64_t slot, int64_t num_blocks, bool sync) {
    if (num_blocks <= 0) return 0;
    int64_t cur = mapped(slot);
    if (cur + num_blocks > max_blocks_per_req) {
      if (!sync) return 0;
      fprintf(stderr, "***** request exceeds max pages *****\n");
      abort();
    }
    if (free_blocks() < num_blocks) {
      if (!sync) return 0;
      reclaim_on_demand(num_blocks);
      if (free_blocks() < num_blocks) {
        fprintf(stderr, "***** OOM on demand *****\n");
        abort();
      }
    }
    int64_t remaining = num_blocks;
    if (!segs[slot].empty()) {
      int64_t room = std::min(tail_room(slot), remaining);
      if (room > 0) {
        auto& last = segs[slot].back();
        extend_last(slot, last.first + last.second, room);
        remaining -= room;
      }
    }
    if (remaining == 0) return num_blocks;
    while (remaining > 0 &&
           (int64_t)segs[slot].size() < max_segments) {
      int64_t start = find_free_run(remaining, true);
      if (start >= 0) {
        open_segment(slot, start, remaining);
        remaining = 0;
        break;
      }
      if ((int64_t)segs[slot].size() == max_segments - 1) break;
      // take the largest hole
      int64_t best = -1, best_len = -1, p = 0;
      while (p < num_arena_blocks) {
        if (owner[p] != -1) { p++; continue; }
        int64_t q = p;
        while (q < num_arena_blocks && owner[q] == -1) q++;
        if (q - p > best_len) { best_len = q - p; best = p; }
        p = q;
      }
      if (best < 0) break;
      int64_t take = std::min(best_len, remaining);
      open_segment(slot, best, take);
      remaining -= take;
    }
    if (remaining == 0) return num_blocks;
    if (!sync) return num_blocks - remaining;
    coalesce_and_grow(slot, remaining);
    return num_blocks;
  }

  void map_for_step(int64_t slot, int64_t seq_len) {
    int64_t required = tokens_to_blocks(seq_len);
    int64_t m = mapped(slot);
    if (required > m) grow(slot, required - m, true);
    seq_lens[slot] = seq_len;
  }

  int64_t need_async(int64_t slot, int64_t eager) const {
    if (!active(slot)) return 0;
    int64_t m = mapped(slot);
    if (m >= max_blocks_per_req) return 0;
    int64_t req = tokens_to_blocks(seq_lens[slot] + eager);
    return std::max<int64_t>(0, req - m);
  }

  void memory_management() {
    int64_t nr_required = 0;
    for (int64_t s = 0; s < max_batch_size; s++)
      nr_required += need_async(s, 1);
    if (free_blocks() < nr_required) reclaim_on_demand(nr_required);
    if (free_blocks() < nr_required) return;
    int64_t nr_mapped = 0;
    bool done = false;
    int64_t num_active = 0;
    for (int64_t s = 0; s < max_batch_size; s++) num_active += active(s);
    int64_t eager_limit =
        (free_blocks() >= 2 * num_active) ? kEagerNumSteps : 2;
    for (int64_t eager = 1; eager < eager_limit && !done; eager++) {
      for (int64_t s = 0; s < max_batch_size; s++) {
        int64_t need = need_async(s, eager);
        nr_mapped += grow(s, need, false);
        if (eager == 1) continue;
        if (nr_mapped >= kEagerNumKvblocks) { done = true; break; }
      }
    }
    if (nr_required) return;
    do_reclaim_pages();
  }
};

std::vector<std::unique_ptr<Allocator>> g_instances;

Allocator& inst(int64_t h) { return *g_instances.at((size_t)h); }

}  // namespace

extern "C" {

int64_t vattn_create() {
  g_instances.push_back(std::make_unique<Allocator>());
  return (int64_t)g_instances.size() - 1;
}

void vattn_destroy(int64_t h) {
  Allocator& a = inst(h);
  if (h >= 0 && (size_t)h < g_instances.size()) g_instances[h].reset();
}

void vattn_init_kvcache(int64_t h, int64_t num_layers, int64_t num_kv_heads,
                        int64_t head_size, int64_t max_batch_size,
                        int64_t max_context_length, int64_t dtype_bytes,
                        int64_t page_size, int megacache,
                        int64_t max_segments) {
  Allocator& a = inst(h);
  a = Allocator();
  a.num_layers = num_layers;
  a.num_kv_heads = num_kv_heads;
  a.head_size = head_size;
  a.max_batch_size = max_batch_size;
  a.max_context_length = max_context_length;
  a.dtype_bytes = dtype_bytes;
  a.page_size = page_size;
  a.megacache = megacache != 0;
  a.max_segments = max_segments;
  int64_t per_token = num_kv_heads * head_size * dtype_bytes;
  if (a.megacache) per_token *= num_layers;
  a.block_tokens = std::max<int64_t>(1, page_size / per_token);
  // round down to a 32-row multiple (DMA sublane alignment); mirrors
  // memory/allocator.py
  if (a.block_tokens > 32) a.block_tokens -= a.block_tokens % 32;
  a.pages_per_kvblock = a.megacache ? 2 : 2 * num_layers;
  a.max_blocks_per_req = a.tokens_to_blocks(max_context_length);
  a.seq_lens.assign(max_batch_size, 0);
  a.segs.assign(max_batch_size, {});
}

int64_t vattn_reserve_physical_pages(int64_t h, int64_t free_memory) {
  Allocator& a = inst(h);
  int64_t num_pages = free_memory / a.page_size;
  num_pages -= num_pages % a.pages_per_kvblock;
  a.num_arena_blocks = num_pages / a.pages_per_kvblock;
  a.owner.assign(a.num_arena_blocks, -1);
  return num_pages;
}

int64_t vattn_block_tokens(int64_t h) { return inst(h).block_tokens; }
int64_t vattn_num_arena_blocks(int64_t h) {
  return inst(h).num_arena_blocks;
}

int64_t vattn_num_free_kvblocks(int64_t h) {
  Allocator& a = inst(h);
  return a.free_blocks() + a.overcommitted();
}

// seq_lens: int64[max_batch_size].  Returns #moves written into
// (moves_src, moves_dst) up to moves_cap.
int64_t vattn_step_async(int64_t h, const int64_t* seq_lens, int32_t* moves_src,
                         int32_t* moves_dst, int64_t moves_cap) {
  Allocator& a = inst(h);
  a.plan.clear();
  for (int64_t s = 0; s < a.max_batch_size; s++)
    a.seq_lens[s] = seq_lens[s];
  for (int64_t s = 0; s < a.max_batch_size; s++)
    a.map_for_step(s, a.seq_lens[s]);
  a.memory_management();
  int64_t n = std::min<int64_t>((int64_t)a.plan.size(), moves_cap);
  for (int64_t i = 0; i < n; i++) {
    moves_src[i] = a.plan[i].src;
    moves_dst[i] = a.plan[i].dst;
  }
  return (int64_t)a.plan.size();
}

int64_t vattn_step_sync(int64_t h, const int64_t* seq_lens, int eager_reclaim,
                        int32_t* moves_src, int32_t* moves_dst,
                        int64_t moves_cap) {
  Allocator& a = inst(h);
  a.plan.clear();
  for (int64_t s = 0; s < a.max_batch_size; s++) {
    int64_t sl = seq_lens[s];
    a.seq_lens[s] = sl;
    if (eager_reclaim && sl == 0 && a.mapped(s) != 0) {
      a.release_some(s, 0);
      continue;
    }
    a.map_for_step(s, sl);
  }
  int64_t n = std::min<int64_t>((int64_t)a.plan.size(), moves_cap);
  for (int64_t i = 0; i < n; i++) {
    moves_src[i] = a.plan[i].src;
    moves_dst[i] = a.plan[i].dst;
  }
  return (int64_t)a.plan.size();
}

int64_t vattn_alloc_new_batch_idx(int64_t h, int64_t seqlen) {
  Allocator& a = inst(h);
  int64_t nr_required = a.tokens_to_blocks(seqlen);
  int64_t new_id = -1;
  for (int64_t s = 0; s < a.max_batch_size; s++) {
    if (a.active(s)) continue;
    if (new_id == -1) { new_id = s; continue; }
    if (a.mapped(s) >= nr_required && a.mapped(s) < a.mapped(new_id))
      new_id = s;
  }
  if (new_id != -1) a.seq_lens[new_id] = seqlen;
  return new_id;
}

void vattn_free_batch_idx(int64_t h, int64_t slot) {
  inst(h).seq_lens[slot] = 0;
}

void vattn_set_deferred_reclamation(int64_t h, int val) {
  Allocator& a = inst(h);
  a.deferred_reclaim = val != 0;
}

// out tables: seg_row int32[B*S] (arena token rows), seg_tokens
// int32[B*S]
void vattn_get_batch_segments(int64_t h, int32_t* seg_row, int32_t* seg_tokens) {
  Allocator& a = inst(h);
  for (int64_t s = 0; s < a.max_batch_size; s++) {
    for (int64_t j = 0; j < a.max_segments; j++) {
      int64_t idx = s * a.max_segments + j;
      if (j < (int64_t)a.segs[s].size()) {
        seg_row[idx] = (int32_t)(a.segs[s][j].first * a.block_tokens);
        seg_tokens[idx] = (int32_t)(a.segs[s][j].second * a.block_tokens);
      } else {
        seg_row[idx] = 0;
        seg_tokens[idx] = 0;
      }
    }
  }
}

void vattn_get_seq_lens(int64_t h, int64_t* out) {
  Allocator& a = inst(h);
  for (int64_t s = 0; s < a.max_batch_size; s++) out[s] = a.seq_lens[s];
}

void vattn_cleanup(int64_t h) {
  Allocator& a = inst(h);
  for (int64_t s = 0; s < a.max_batch_size; s++) {
    a.seq_lens[s] = 0;
    a.release_some(s, 0);
  }
}

}  // extern "C"
