// Native host core: sequential-greedy setup algorithms.
//
// The device path uses data-parallel MIS/label-propagation formulations;
// these C++ routines provide the classic *sequential greedy* variants whose
// exact coarse-grid quality the PyAMG test thresholds assume (behavioral
// parity with reference pyamg/amg_core/{ruge_stuben,smoothed_aggregation}.h,
// re-implemented here with a lazy-deletion max-heap instead of the
// reference's bucket-interval queue).
//
// Build: g++ -O3 -shared -fPIC -o libamg_host.so amg_host.cpp
// ABI: plain C functions over int32/float64 buffers (ctypes-friendly).

#include <cstdint>
#include <queue>
#include <vector>
#include <cstring>
#include <cmath>

using i32 = std::int32_t;
using f64 = double;

namespace {
constexpr i32 U_NODE = -3;   // unassigned
constexpr i32 PRE_F = -2;    // tentative F
constexpr i32 F_NODE = 0;
constexpr i32 C_NODE = 1;
}

extern "C" {

// ---------------------------------------------------------------------------
// Standard (3-pass greedy) aggregation.
//   S: strength graph CSR (with or without diagonal).
//   labels out: aggregate id per node, -1 if unaggregated (isolated).
//   cpts out: root node per aggregate (capacity n).
// Returns number of aggregates.
// ---------------------------------------------------------------------------
i32 standard_aggregation(i32 n, const i32* Sp, const i32* Sj,
                         i32* labels, i32* cpts) {
  std::vector<i32> x(n, 0);  // 0 = free, >0 aggregate id+1, <0 attached
  i32 next = 1;
  const i32 ISOLATED = -(n + 1);

  // pass 1: seed aggregates where no neighbor is aggregated
  for (i32 i = 0; i < n; ++i) {
    if (x[i]) continue;
    bool has_nbr = false, has_agg_nbr = false;
    for (i32 jj = Sp[i]; jj < Sp[i + 1]; ++jj) {
      i32 j = Sj[jj];
      if (j == i) continue;
      has_nbr = true;
      if (x[j]) { has_agg_nbr = true; break; }
    }
    if (!has_nbr) {
      x[i] = ISOLATED;
    } else if (!has_agg_nbr) {
      x[i] = next;
      cpts[next - 1] = i;
      for (i32 jj = Sp[i]; jj < Sp[i + 1]; ++jj) x[Sj[jj]] = next;
      ++next;
    }
  }

  // pass 2: attach stragglers to a neighboring aggregate (first found)
  for (i32 i = 0; i < n; ++i) {
    if (x[i]) continue;
    for (i32 jj = Sp[i]; jj < Sp[i + 1]; ++jj) {
      i32 xj = x[Sj[jj]];
      if (xj > 0) { x[i] = -xj; break; }
    }
  }

  i32 nagg = next - 1;

  // pass 3: leftovers seed new aggregates over their free neighbors
  for (i32 i = 0; i < n; ++i) {
    i32 xi = x[i];
    if (xi != 0) {
      if (xi > 0) labels[i] = xi - 1;
      else if (xi == ISOLATED) labels[i] = -1;
      else labels[i] = -xi - 1;
      continue;
    }
    // new aggregate rooted at i
    labels[i] = nagg;
    cpts[nagg] = i;
    for (i32 jj = Sp[i]; jj < Sp[i + 1]; ++jj) {
      i32 j = Sj[jj];
      if (j != i && x[j] == 0) { labels[j] = nagg; x[j] = 1; }
    }
    x[i] = 1;
    ++nagg;
  }
  return nagg;
}

// ---------------------------------------------------------------------------
// Naive aggregation: greedy maximal independent aggregates (reference
// smoothed_aggregation.h:270 semantics).
// ---------------------------------------------------------------------------
i32 naive_aggregation(i32 n, const i32* Sp, const i32* Sj,
                      i32* labels, i32* cpts) {
  for (i32 i = 0; i < n; ++i) labels[i] = -1;
  i32 nagg = 0;
  for (i32 i = 0; i < n; ++i) {
    if (labels[i] >= 0) continue;
    // aggregate i with all free neighbors
    labels[i] = nagg;
    cpts[nagg] = i;
    bool any = false;
    for (i32 jj = Sp[i]; jj < Sp[i + 1]; ++jj) {
      i32 j = Sj[jj];
      if (j != i && labels[j] < 0) { labels[j] = nagg; any = true; }
    }
    (void)any;
    ++nagg;
  }
  return nagg;
}

// ---------------------------------------------------------------------------
// Ruge-Stuben first-pass C/F splitting (classic greedy, max-heap variant).
//   S  : strength CSR  (row i = points strongly influencing i)
//   T  : S transpose   (row i = points i strongly influences)
//   influence: extra per-node weights (usually 0)
//   splitting out: 1 = C, 0 = F
// ---------------------------------------------------------------------------
void rs_cf_splitting(i32 n, const i32* Sp, const i32* Sj,
                     const i32* Tp, const i32* Tj,
                     const i32* influence, i32* splitting) {
  std::vector<i32> lam(n);
  std::vector<i32> state(n, U_NODE);

  for (i32 i = 0; i < n; ++i)
    lam[i] = (Tp[i + 1] - Tp[i]) + (influence ? influence[i] : 0);

  // isolated nodes (no influence on anyone) start as F
  for (i32 i = 0; i < n; ++i) {
    bool only_self = (Tp[i + 1] - Tp[i] == 1) && (Tj[Tp[i]] == i);
    if (lam[i] == 0 || (lam[i] == 1 && only_self)) state[i] = F_NODE;
  }

  // lazy-deletion max-heap of (lambda, node)
  using Entry = std::pair<i32, i32>;
  std::priority_queue<Entry> heap;
  for (i32 i = 0; i < n; ++i)
    if (state[i] == U_NODE) heap.push({lam[i], i});

  while (!heap.empty()) {
    auto [l, i] = heap.top();
    heap.pop();
    if (state[i] != U_NODE || l != lam[i]) continue;  // stale entry
    if (lam[i] <= 0) break;
    state[i] = C_NODE;

    // neighbors that i influences become F
    for (i32 jj = Tp[i]; jj < Tp[i + 1]; ++jj) {
      i32 j = Tj[jj];
      if (state[j] == U_NODE) state[j] = PRE_F;
    }
    for (i32 jj = Tp[i]; jj < Tp[i + 1]; ++jj) {
      i32 j = Tj[jj];
      if (state[j] != PRE_F) continue;
      state[j] = F_NODE;
      // unassigned influencers of the new F point gain weight
      for (i32 kk = Sp[j]; kk < Sp[j + 1]; ++kk) {
        i32 k = Sj[kk];
        if (state[k] == U_NODE && lam[k] < n - 1) {
          ++lam[k];
          heap.push({lam[k], k});
        }
      }
    }
    // unassigned influencers of the new C point lose weight
    for (i32 jj = Sp[i]; jj < Sp[i + 1]; ++jj) {
      i32 j = Sj[jj];
      if (state[j] == U_NODE && lam[j] > 0) {
        --lam[j];
        heap.push({lam[j], j});
      }
    }
  }

  for (i32 i = 0; i < n; ++i)
    splitting[i] = (state[i] == C_NODE) ? 1 : 0;
}

// ---------------------------------------------------------------------------
// RS second pass: ensure strong F-F pairs share a common C point
// (reference ruge_stuben.h:484 semantics).
// ---------------------------------------------------------------------------
void rs_cf_splitting_pass2(i32 n, const i32* Sp, const i32* Sj,
                           i32* splitting) {
  for (i32 row = 0; row < n; ++row) {
    if (splitting[row] != 0) continue;  // F only
    i32 cpt0 = -1;
    for (i32 jj = Sp[row]; jj < Sp[row + 1]; ++jj) {
      i32 j = Sj[jj];
      if (j == row || splitting[j] != 0) continue;
      // does row share a strong C with j?
      bool dep = false;
      for (i32 ii = Sp[row]; ii < Sp[row + 1] && !dep; ++ii) {
        i32 c = Sj[ii];
        if (splitting[c] != 1) continue;
        for (i32 kk = Sp[j]; kk < Sp[j + 1]; ++kk)
          if (Sj[kk] == c) { dep = true; break; }
      }
      if (dep) continue;
      if (cpt0 < 0) {
        cpt0 = j;
        splitting[j] = 1;
      } else {
        splitting[cpt0] = 0;
        cpt0 = j;
        splitting[j] = 1;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// First-fit greedy vertex coloring over CSR adjacency (the reference's
// vertex_coloring_first_fit, graph.h:248).  Sequential O(nnz); used by the
// multicolor-GS smoother setup where any valid coloring works and fewer
// colors means fewer sweep steps.  Returns the number of colors.
// ---------------------------------------------------------------------------
i32 first_fit_coloring(i32 n, const i32* Ap, const i32* Aj, i32* color) {
    std::vector<i32> mark(64, -1);   // color -> last row that saw it
    i32 ncolors = 0;
    for (i32 i = 0; i < n; ++i) color[i] = -1;
    for (i32 i = 0; i < n; ++i) {
        for (i32 jj = Ap[i]; jj < Ap[i + 1]; ++jj) {
            i32 j = Aj[jj];
            if (j == i || j < 0 || j >= n) continue;
            i32 c = color[j];
            if (c >= 0) mark[(size_t)c] = i;
        }
        i32 c = 0;
        while (c < (i32)mark.size() && mark[(size_t)c] == i) ++c;
        if (c >= (i32)mark.size()) mark.resize((size_t)c + 1, -1);
        color[i] = c;
        if (c + 1 > ncolors) ncolors = c + 1;
    }
    return ncolors;
}

// ---------------------------------------------------------------------------
// Lloyd helpers and misc graph golds can be added here as needed.
// ---------------------------------------------------------------------------

}  // extern "C"
