// graphcore — native host-side graph preprocessing for
// custom_op_benchmark_tpu.
//
// The hot *device* path is Pallas/XLA; this library is the native runtime
// around it: the cold-path graph preprocessing that the reference does in
// Python loops (wrapper.py:84-116 dual-CSR construction; part_csr.py row
// chunking) and that real datasets (ogbn-*, papers100M-scale) need at
// C speed: canonical edge sorting, dual-CSR construction, edge-balanced
// partitioning, and layered uniform neighbor sampling.
//
// Exposed as a plain C ABI consumed via ctypes (graph/native.py) — no
// pybind11 dependency. All index arrays are int32 (TPU-native width);
// callers allocate outputs.
//
// Build: make -C custom_op_benchmark_tpu/csrc

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

namespace {

// splitmix64 — cheap per-stream generator so every (hop, node) pair owns
// an independent deterministic stream: the sampled edge SET is invariant
// under frontier order and thread count.
inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

// Lemire bounded draw in [0, bound) — one multiply, no division.
inline uint32_t bounded(uint64_t& s, uint32_t bound) {
  return static_cast<uint32_t>(
      (static_cast<uint64_t>(static_cast<uint32_t>(splitmix64(s))) * bound)
      >> 32);
}

}  // namespace

extern "C" {

// Sort edges into canonical (src-major, dst-minor) order and build the
// dual CSR/CSC with canonical-eid permutations.
//
// Inputs:  src[e], dst[e] (any order), n_nodes, e.
// Outputs (caller-allocated):
//   src_c[e], dst_c[e]          — canonical-sorted endpoints
//   indptr_r[n_nodes + 2]       — CSR pointers (dummy pad segment last)
//   csc_perm[e], csc_perm_inv[e]
//   indptr_c[n_nodes + 2]
// Returns 0 on success, nonzero on bad input.
int32_t graphcore_build_dual_csr(
    const int64_t* src, const int64_t* dst, int64_t e, int64_t n_nodes,
    int32_t* src_c, int32_t* dst_c, int32_t* indptr_r,
    int32_t* csc_perm, int32_t* csc_perm_inv, int32_t* indptr_c) {
  if (e < 0 || n_nodes <= 0) return 1;

  // Counting sort by src (stable), then by dst within src via a second
  // counting pass — O(e + n), no comparison sort.
  std::vector<int64_t> cnt(n_nodes + 2, 0);
  for (int64_t i = 0; i < e; ++i) {
    if (src[i] < 0 || src[i] >= n_nodes || dst[i] < 0 || dst[i] >= n_nodes)
      return 2;
    ++cnt[src[i] + 1];
  }
  std::partial_sum(cnt.begin(), cnt.end(), cnt.begin());

  // Bucket edges by src, then sort each src bucket by dst (buckets are
  // typically short; std::sort per bucket beats a global radix here).
  std::vector<int64_t> order(e);
  {
    std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
    for (int64_t i = 0; i < e; ++i) order[cursor[src[i]]++] = i;
  }
  for (int64_t u = 0; u < n_nodes; ++u) {
    auto beg = order.begin() + cnt[u];
    auto end = order.begin() + cnt[u + 1];
    std::stable_sort(beg, end, [&](int64_t a, int64_t b) {
      return dst[a] < dst[b];
    });
  }
  for (int64_t i = 0; i < e; ++i) {
    src_c[i] = static_cast<int32_t>(src[order[i]]);
    dst_c[i] = static_cast<int32_t>(dst[order[i]]);
  }
  for (int64_t u = 0; u <= n_nodes; ++u)
    indptr_r[u] = static_cast<int32_t>(cnt[u]);
  indptr_r[n_nodes + 1] = static_cast<int32_t>(e);

  // CSC: stable counting sort of canonical positions by dst.
  std::vector<int64_t> ccnt(n_nodes + 2, 0);
  for (int64_t i = 0; i < e; ++i) ++ccnt[dst_c[i] + 1];
  std::partial_sum(ccnt.begin(), ccnt.end(), ccnt.begin());
  {
    std::vector<int64_t> cursor(ccnt.begin(), ccnt.end() - 1);
    for (int64_t i = 0; i < e; ++i) {
      int64_t pos = cursor[dst_c[i]]++;
      csc_perm[pos] = static_cast<int32_t>(i);
      csc_perm_inv[i] = static_cast<int32_t>(pos);
    }
  }
  for (int64_t v = 0; v <= n_nodes; ++v)
    indptr_c[v] = static_cast<int32_t>(ccnt[v]);
  indptr_c[n_nodes + 1] = static_cast<int32_t>(e);
  return 0;
}

// Row chunking (reference contract: part_csr.py:13-27): split each CSR row
// into chunks of <= chunk_size edges. Two-phase: count then fill.
// Returns the number of chunks; if out arrays are null, only counts.
int64_t graphcore_partition_csr(
    const int32_t* indptr, int64_t n_rows, int32_t chunk_size,
    int32_t* row_out, int32_t* chunk_indptr_out) {
  int64_t total = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t deg = indptr[r + 1] - indptr[r];
    total += (deg + chunk_size - 1) / chunk_size;
  }
  if (row_out == nullptr || chunk_indptr_out == nullptr) return total;
  int64_t c = 0;
  chunk_indptr_out[0] = indptr[0];
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int32_t s = indptr[r]; s < indptr[r + 1]; s += chunk_size) {
      row_out[c] = static_cast<int32_t>(r);
      chunk_indptr_out[c + 1] =
          std::min<int32_t>(s + chunk_size, indptr[r + 1]);
      ++c;
    }
  }
  return total;
}

// Layered uniform neighbor sampling over a CSC (in-neighbor) structure.
// For each seed, draw <= fanout in-edges without replacement.
// Outputs: src_out/dst_out sized n_seeds*fanout; returns edges written.
int64_t graphcore_sample_in_edges(
    const int32_t* indptr_c, const int32_t* indices_c, int64_t n_nodes,
    const int32_t* seeds, int64_t n_seeds, int32_t fanout, uint64_t seed,
    int32_t* src_out, int32_t* dst_out) {
  std::mt19937_64 rng(seed);
  int64_t w = 0;
  std::vector<int32_t> reservoir(fanout);
  for (int64_t i = 0; i < n_seeds; ++i) {
    int32_t v = seeds[i];
    if (v < 0 || v >= n_nodes) continue;
    int64_t lo = indptr_c[v], hi = indptr_c[v + 1];
    int64_t deg = hi - lo;
    if (deg <= fanout) {
      for (int64_t p = lo; p < hi; ++p) {
        src_out[w] = indices_c[p];
        dst_out[w] = v;
        ++w;
      }
    } else {
      // Reservoir sampling without replacement.
      for (int32_t j = 0; j < fanout; ++j) reservoir[j] = indices_c[lo + j];
      for (int64_t p = fanout; p < deg; ++p) {
        uint64_t j = rng() % (p + 1);
        if (j < static_cast<uint64_t>(fanout))
          reservoir[j] = indices_c[lo + p];
      }
      for (int32_t j = 0; j < fanout; ++j) {
        src_out[w] = reservoir[j];
        dst_out[w] = v;
        ++w;
      }
    }
  }
  return w;
}

// Whole-minibatch layered neighbor sampling (data/sampling.py
// NeighborSampler.sample, at C speed): layered fanout expansion over the
// CSC, local renumbering (seeds first, then visited nodes ascending),
// optional self loops, and the dense single-bucket in-neighbor matrix
// (`in_cols`), in one call. The Python path pays ~35 ms/batch of numpy
// set algebra + gathers at the Reddit shape; this does the same work in
// a few ms and parallelizes the per-seed draws across `n_threads`
// (per-(hop,node) RNG streams keep the sampled edge SET thread-count
// invariant; only edge order varies with n_threads).
//
// Per-seed draws: all in-edges when deg <= fanout; otherwise Floyd's
// algorithm (O(fanout) draws) for fanout <= 64, reservoir sampling
// beyond that.
//
// Outputs (caller-allocated): node_ids[max_nodes] (tail zeros),
// lsrc/ldst[max_edges] (local-id edges), in_cols[max_nodes*w] (pad =
// max_nodes; pass w=0 to skip), n_out[2] = {n_local, n_edges}.
// Returns 0, or negative on error (-4: in-degree exceeded w).
int64_t graphcore_sample_subgraph(
    const int32_t* indptr_c, const int32_t* indices_c, int64_t n_nodes,
    const int32_t* seeds, int64_t n_seeds,
    const int32_t* fanouts, int64_t n_hops,
    uint64_t seed, int32_t add_self_loops,
    int64_t max_nodes, int64_t max_edges, int32_t w, int32_t n_threads,
    int32_t* node_ids, int32_t* lsrc, int32_t* ldst, int32_t* in_cols,
    int64_t* n_out) {
  if (n_nodes <= 0 || n_seeds < 0 || n_hops < 0 || max_nodes <= 0 ||
      max_edges < 0)
    return -1;
  std::vector<uint8_t> visited(n_nodes, 0);
  std::vector<int32_t> frontier;
  frontier.reserve(n_seeds);
  for (int64_t i = 0; i < n_seeds; ++i) {
    int32_t v = seeds[i];
    if (v < 0 || v >= n_nodes) return -2;
    if (!visited[v]) {
      visited[v] = 1;
      frontier.push_back(v);
    }
  }
  std::sort(frontier.begin(), frontier.end());

  std::vector<int32_t> gsrc, gdst;   // global-id sampled edges
  std::vector<int32_t> newcomers;    // visited non-seed nodes (any order)
  if (n_threads < 1) n_threads = 1;

  for (int64_t hop = 0; hop < n_hops; ++hop) {
    const int32_t f = fanouts[hop];
    if (f < 0) return -1;
    const int64_t nf = static_cast<int64_t>(frontier.size());
    const int64_t base = static_cast<int64_t>(gsrc.size());
    // Per-seed slot capacity f; compact after the parallel fill.
    gsrc.resize(base + nf * f);
    gdst.resize(base + nf * f);
    std::vector<int32_t> taken(nf, 0);
    const uint64_t hop_salt =
        seed ^ (0x9e3779b97f4a7c15ULL * static_cast<uint64_t>(hop + 1));

    auto draw_range = [&](int64_t lo_i, int64_t hi_i) {
      std::vector<int32_t> fset(std::max<int32_t>(f, 1));
      // Software-prefetching the CSC rows ahead was tried and measured
      // NO faster at the Reddit shape (12.5 ms with vs without) — the
      // hardware prefetcher already covers the sorted-frontier access
      // pattern. Keep the loop simple.
      for (int64_t i = lo_i; i < hi_i; ++i) {
        const int32_t v = frontier[i];
        const int64_t lo = indptr_c[v], hi = indptr_c[v + 1];
        const int64_t deg = hi - lo;
        int32_t* sp = gsrc.data() + base + i * f;
        int32_t t = 0;
        if (deg <= f) {
          for (int64_t p = lo; p < hi; ++p) sp[t++] = indices_c[p];
        } else {
          uint64_t st = hop_salt ^ (0xda942042e4dd58b5ULL *
                                    static_cast<uint64_t>(v + 1));
          if (f <= 64) {
            // Floyd: f draws regardless of degree; the candidate set is
            // tiny so a linear membership scan beats any hash here.
            for (int64_t j = deg - f; j < deg; ++j) {
              uint32_t r = bounded(st, static_cast<uint32_t>(j + 1));
              bool dup = false;
              for (int32_t q = 0; q < t; ++q)
                if (fset[q] == static_cast<int32_t>(r)) { dup = true; break; }
              fset[t] = dup ? static_cast<int32_t>(j)
                            : static_cast<int32_t>(r);
              ++t;
            }
            for (int32_t q = 0; q < t; ++q)
              sp[q] = indices_c[lo + fset[q]];
          } else {
            for (int32_t j = 0; j < f; ++j) sp[j] = indices_c[lo + j];
            for (int64_t p = f; p < deg; ++p) {
              uint32_t r = bounded(st, static_cast<uint32_t>(p + 1));
              if (r < static_cast<uint32_t>(f)) sp[r] = indices_c[lo + p];
            }
            t = f;
          }
        }
        for (int32_t q = 0; q < t; ++q)
          gdst[base + i * f + q] = v;
        taken[i] = t;
      }
    };

    if (n_threads == 1 || nf < 4096) {
      draw_range(0, nf);
    } else {
      std::vector<std::thread> pool;
      const int64_t chunk = (nf + n_threads - 1) / n_threads;
      for (int32_t th = 0; th < n_threads; ++th) {
        const int64_t lo_i = th * chunk;
        const int64_t hi_i = std::min(nf, lo_i + chunk);
        if (lo_i >= hi_i) break;
        pool.emplace_back(draw_range, lo_i, hi_i);
      }
      for (auto& th : pool) th.join();
    }

    // Compact the per-seed slots and collect this hop's new nodes.
    int64_t wpos = base;
    for (int64_t i = 0; i < nf; ++i) {
      const int64_t rpos = base + i * f;
      for (int32_t q = 0; q < taken[i]; ++q) {
        gsrc[wpos] = gsrc[rpos + q];
        gdst[wpos] = gdst[rpos + q];
        ++wpos;
      }
    }
    gsrc.resize(wpos);
    gdst.resize(wpos);
    frontier.clear();
    for (int64_t p = base; p < wpos; ++p) {
      const int32_t u = gsrc[p];
      if (!visited[u]) {
        visited[u] = 1;
        frontier.push_back(u);
        newcomers.push_back(u);
      }
    }
    std::sort(frontier.begin(), frontier.end());
  }

  // Local order: seeds (given order) first, then the rest ascending —
  // exactly the Python path's [seeds, flatnonzero(visited & ~seed)].
  std::sort(newcomers.begin(), newcomers.end());
  int64_t n_local = n_seeds + static_cast<int64_t>(newcomers.size());
  if (n_local > max_nodes) n_local = max_nodes;  // trim deepest extras

  std::vector<int32_t> lookup(n_nodes, -1);
  for (int64_t i = 0; i < n_local; ++i) {
    const int32_t gid =
        i < n_seeds ? seeds[i] : newcomers[i - n_seeds];
    node_ids[i] = gid;
    lookup[gid] = static_cast<int32_t>(i);
  }
  for (int64_t i = n_local; i < max_nodes; ++i) node_ids[i] = 0;

  int64_t ne = 0;
  const int64_t total = static_cast<int64_t>(gsrc.size());
  for (int64_t p = 0; p < total && ne < max_edges; ++p) {
    const int32_t lu = lookup[gsrc[p]];
    const int32_t lv = lookup[gdst[p]];
    if (lu < 0 || lv < 0) continue;  // endpoint trimmed away
    lsrc[ne] = lu;
    ldst[ne] = lv;
    ++ne;
  }
  if (add_self_loops) {
    for (int64_t i = 0; i < n_local && ne < max_edges; ++i) {
      lsrc[ne] = static_cast<int32_t>(i);
      ldst[ne] = static_cast<int32_t>(i);
      ++ne;
    }
  }

  if (w > 0 && in_cols != nullptr) {
    const int64_t cells = max_nodes * w;
    for (int64_t i = 0; i < cells; ++i)
      in_cols[i] = static_cast<int32_t>(max_nodes);
    std::vector<int32_t> cnt(n_local, 0);
    for (int64_t p = 0; p < ne; ++p) {
      const int32_t v = ldst[p];
      if (cnt[v] >= w) return -4;  // sampler in-degree invariant broken
      in_cols[static_cast<int64_t>(v) * w + cnt[v]] = lsrc[p];
      ++cnt[v];
    }
  }
  n_out[0] = n_local;
  n_out[1] = ne;
  return 0;
}

// Block-sparse tiling metadata: assign each canonical edge to its
// (row-block, col-block) tile; emit sorted unique tiles + per-edge tile
// coordinates. Two-phase like partition_csr. Returns tile count.
int64_t graphcore_tile_edges(
    const int32_t* src_c, const int32_t* dst_c, int64_t e, int64_t n_nodes,
    int32_t tile_r, int32_t tile_c,
    int32_t* tile_rows_out, int32_t* tile_cols_out,
    int32_t* edge_tile_out, int32_t* edge_r_out, int32_t* edge_c_out) {
  int64_t ncb = (n_nodes + tile_c - 1) / tile_c;
  std::vector<int64_t> keys(e);
  for (int64_t i = 0; i < e; ++i)
    keys[i] = static_cast<int64_t>(src_c[i] / tile_r) * ncb +
              (dst_c[i] / tile_c);
  std::vector<int64_t> uniq(keys);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  int64_t t = static_cast<int64_t>(uniq.size());
  if (tile_rows_out == nullptr) return t;
  for (int64_t k = 0; k < t; ++k) {
    tile_rows_out[k] = static_cast<int32_t>(uniq[k] / ncb);
    tile_cols_out[k] = static_cast<int32_t>(uniq[k] % ncb);
  }
  for (int64_t i = 0; i < e; ++i) {
    int64_t k = std::lower_bound(uniq.begin(), uniq.end(), keys[i]) -
                uniq.begin();
    edge_tile_out[i] = static_cast<int32_t>(k);
    edge_r_out[i] = src_c[i] % tile_r;
    edge_c_out[i] = dst_c[i] % tile_c;
  }
  return t;
}

// Weakly-connected components: union-find with union-by-size and path
// halving — O(e·α). Python/numpy has no vectorized equivalent (the
// tile-aligned reorder, graph/reorder.py, needs this at ogbn scales).
// Writes the component root id per node into labels_out; returns the
// number of distinct components.
int64_t graphcore_connected_components(
    const int32_t* src, const int32_t* dst, int64_t e, int64_t n_nodes,
    int32_t* labels_out) {
  std::vector<int32_t> parent(n_nodes);
  std::vector<int32_t> size(n_nodes, 1);
  std::iota(parent.begin(), parent.end(), 0);
  auto find = [&](int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  };
  for (int64_t i = 0; i < e; ++i) {
    int32_t a = src[i], b = dst[i];
    if (a < 0 || a >= n_nodes || b < 0 || b >= n_nodes) continue;
    int32_t ra = find(a), rb = find(b);
    if (ra == rb) continue;
    if (size[ra] < size[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    size[ra] += size[rb];
  }
  int64_t n_comp = 0;
  for (int64_t v = 0; v < n_nodes; ++v) {
    int32_t r = find(static_cast<int32_t>(v));
    labels_out[v] = r;
    if (r == v) ++n_comp;
  }
  return n_comp;
}

// Degree-bucketed ELL packing for one traversal direction
// (graph/ell.py `ell_pack` contract, at C speed for the 1B+ edge
// regime where the vectorized-numpy cold path stops being "cold").
//
// Inputs: the direction's CSR (indptr[n+1], cols_all[e'], eids_all[e']
// where e' = indptr[n]); `widths` ascending, already extended to cover
// the max degree; row_pad for per-bucket row rounding.
//
// Two-phase protocol (like graphcore_partition_csr): with the flat
// output pointers null, only fills bucket_rows[w] = padded row count
// per width (0 for empty buckets) and returns 0. With outputs non-null
// (caller sizes them from bucket_rows: rows_flat = sum r_pad,
// cols/eid_flat = sum r_pad*width), fills:
//   rows_flat / cols_flat / eid_flat — per-bucket arrays concatenated
//     in width order (pads: rows=n, cols=n, eid=e_pad);
//   row_pos[n]     — packed-row index per node (total_rows if empty);
//   edge_pos[e_pad] — flat slot per canonical eid (total_slots if pad).
int64_t graphcore_ell_pack(
    const int32_t* indptr, int64_t n, const int32_t* cols_all,
    const int64_t* eids_all, int64_t e_pad, const int64_t* widths,
    int64_t n_widths, int64_t row_pad, int64_t* bucket_rows,
    int32_t* rows_flat, int32_t* cols_flat, int32_t* eid_flat,
    int32_t* row_pos, int64_t* edge_pos) {
  if (n < 0 || n_widths <= 0 || row_pad <= 0) return -1;
  // int32 guard: eid_flat and the e_pad pad sentinel are int32; at
  // e_pad >= 2^31 the casts below would overflow SILENTLY (writing
  // truncated indices before any Python-side size check could run).
  // Refuse here so ell_pack_native falls back to the numpy path.
  const int64_t kI32Max = 2147483647LL;
  if (e_pad >= kI32Max || n >= kI32Max) return -3;
  // Bucket index per node by degree (degree-0 nodes -> no bucket).
  std::vector<int32_t> bucket_of(n, -1);
  std::vector<int64_t> counts(n_widths, 0);
  for (int64_t v = 0; v < n; ++v) {
    int64_t deg = indptr[v + 1] - indptr[v];
    if (deg <= 0) continue;
    int64_t b = 0;
    while (b < n_widths && widths[b] < deg) ++b;
    if (b >= n_widths) return -2;  // widths don't cover max degree
    bucket_of[v] = static_cast<int32_t>(b);
    ++counts[b];
  }
  int64_t slots_total = 0;
  for (int64_t b = 0; b < n_widths; ++b) {
    bucket_rows[b] =
        counts[b] ? ((counts[b] + row_pad - 1) / row_pad) * row_pad : 0;
    slots_total += bucket_rows[b] * widths[b];
  }
  // row_pos/edge_pos hold flat row/slot positions as int32 (edge_pos is
  // int64 but graph/ell.py downcasts it); refuse before writing.
  if (slots_total >= kI32Max) return -3;
  if (rows_flat == nullptr) return 0;  // count phase done

  // Flat offsets per bucket.
  std::vector<int64_t> row_base(n_widths + 1, 0), slot_base(n_widths + 1, 0);
  for (int64_t b = 0; b < n_widths; ++b) {
    row_base[b + 1] = row_base[b] + bucket_rows[b];
    slot_base[b + 1] = slot_base[b] + bucket_rows[b] * widths[b];
  }
  const int64_t total_rows = row_base[n_widths];
  const int64_t total_slots = slot_base[n_widths];
  // Pad fills.
  for (int64_t i = 0; i < total_rows; ++i)
    rows_flat[i] = static_cast<int32_t>(n);
  for (int64_t i = 0; i < total_slots; ++i) {
    cols_flat[i] = static_cast<int32_t>(n);
    eid_flat[i] = static_cast<int32_t>(e_pad);
  }
  for (int64_t i = 0; i < e_pad; ++i) edge_pos[i] = total_slots;

  std::vector<int64_t> cursor(n_widths, 0);  // next row within bucket
  for (int64_t v = 0; v < n; ++v) {
    int32_t b = bucket_of[v];
    if (b < 0) {
      row_pos[v] = static_cast<int32_t>(total_rows);
      continue;
    }
    const int64_t r = cursor[b]++;
    const int64_t w = widths[b];
    row_pos[v] = static_cast<int32_t>(row_base[b] + r);
    rows_flat[row_base[b] + r] = static_cast<int32_t>(v);
    const int64_t slot0 = slot_base[b] + r * w;
    const int64_t lo = indptr[v], hi = indptr[v + 1];
    for (int64_t j = lo; j < hi; ++j) {
      const int64_t k = j - lo;
      cols_flat[slot0 + k] = cols_all[j];
      const int64_t eid = eids_all[j];
      eid_flat[slot0 + k] = static_cast<int32_t>(eid);
      if (eid >= 0 && eid < e_pad) edge_pos[eid] = slot0 + k;
    }
  }
  return total_rows;
}

}  // extern "C"
