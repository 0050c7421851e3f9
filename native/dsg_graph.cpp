// dsg_graph: native stage-2 graph kernels for drivescenegen_tpu.
//
// Pixel-path recovery on skeletonized rasters: multi-source BFS flood with
// parent tracing, plus the merge-nodes-until-stable loop — an exact port of
// drivescenegen_tpu/vectorize/network.py (find_paths / connect_graph), which
// itself mirrors the reference's street-network extractor
// (vectorization/graph/extract_network.py:149-261). The Python version is
// the hot loop of the whole vectorization stage (~26 ms/image of per-pixel
// dict/BFS work); this runs the same algorithm at C++ speed and the Python
// module falls back to its own implementation when the library is absent.
//
// Conventions (match network.py): the skeleton array is indexed [x][y]
// (dim0 = x = width axis), nodes are (x, y) int32 pairs, a pixel id is
// x * H + y where H is the dim1 extent. Iteration order — frontier order,
// neighbor order (dy outer, dx inner), emission order, dedup by interior
// overlap per (start, stop) pair — replicates the Python exactly so both
// implementations produce identical paths (tests/test_native_graph.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC dsg_graph.cpp -o libdsg_graph.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <unordered_set>
#include <utility>
#include <vector>

namespace {

struct Path {
  int32_t start;  // pixel id, start <= stop (lexicographic == id order)
  int32_t stop;
  std::vector<int32_t> pix;  // ordered pixel ids, seed_c ... c, n ... seed_n
};

// Flood state sized to the image; reused across merge iterations.
struct Flood {
  int32_t W, H;
  const uint8_t* skel;
  std::vector<int32_t> parent;  // pixel id -> parent id; -1 root, -2 unvisited
  std::vector<int32_t> dist;

  Flood(const uint8_t* s, int32_t w, int32_t h) : W(w), H(h), skel(s) {}

  void trace_back(int32_t p, std::vector<int32_t>* out) const {
    out->clear();
    while (p >= 0) {
      out->push_back(p);
      p = parent[p];
    }
  }

  // Exact port of network.py find_paths(). `nodes` are pixel ids in seed
  // order (duplicates collapse, as dict insertion did).
  void find_paths(const std::vector<int32_t>& nodes, std::vector<Path>* out) {
    out->clear();
    parent.assign(static_cast<size_t>(W) * H, -2);
    dist.assign(static_cast<size_t>(W) * H, 0);
    std::vector<int32_t> frontier, next_frontier;
    for (int32_t n : nodes) {
      if (parent[n] == -2) {
        parent[n] = -1;
        dist[n] = 0;
        frontier.push_back(n);
      }
    }
    // Dedup: accumulated interior-pixel set per (start, stop) pair
    // (== union of path[1:-1] over accepted paths with those endpoints).
    std::map<std::pair<int32_t, int32_t>, std::unordered_set<int32_t>> interiors;
    std::vector<int32_t> tn, tc;

    while (!frontier.empty()) {
      next_frontier.clear();
      for (int32_t n : frontier) {
        const int32_t x = n / H, y = n % H;
        for (int dy = -1; dy <= 1; ++dy) {
          const int32_t cy = y + dy;
          if (cy < 0 || cy >= H) continue;
          for (int dx = -1; dx <= 1; ++dx) {
            if (dx == 0 && dy == 0) continue;
            const int32_t cx = x + dx;
            if (cx < 0 || cx >= W) continue;
            if (!skel[static_cast<size_t>(cx) * H + cy]) continue;
            const int32_t c = cx * H + cy;
            if (parent[c] == -2) {
              parent[c] = n;
              dist[c] = dist[n] + 1;
              next_frontier.push_back(c);
            } else if (dist[c] >= dist[n]) {
              trace_back(n, &tn);  // [n, ..., seed_n]
              trace_back(c, &tc);  // [c, ..., seed_c]
              // path = reversed(tc) + tn = seed_c ... c, n ... seed_n
              const int32_t e0 = tc.back(), e1 = tn.back();
              const int32_t start = std::min(e0, e1), stop = std::max(e0, e1);
              if (start == stop) continue;
              // Interior = everything but the two endpoint pixels.
              auto& seen = interiors[{start, stop}];
              bool overlap = false;
              for (size_t i = 0; !overlap && i + 1 < tc.size(); ++i)
                overlap = seen.count(tc[i]) != 0;
              for (size_t i = 0; !overlap && i + 1 < tn.size(); ++i)
                overlap = seen.count(tn[i]) != 0;
              if (overlap) continue;
              out->emplace_back();
              Path& p = out->back();
              p.start = start;
              p.stop = stop;
              p.pix.reserve(tc.size() + tn.size());
              for (size_t i = tc.size(); i-- > 0;) p.pix.push_back(tc[i]);
              for (int32_t v : tn) p.pix.push_back(v);
              for (size_t i = 0; i + 1 < tc.size(); ++i) seen.insert(tc[i]);
              for (size_t i = 0; i + 1 < tn.size(); ++i) seen.insert(tn[i]);
            }
          }
        }
      }
      frontier.swap(next_frontier);
    }
  }
};

// network.py merge_nodes: shortest path between the pair, midpoint becomes
// the new node, PREPENDED to the node list (order affects the next flood).
void merge_nodes(std::vector<int32_t>* nodes, const std::vector<Path>& paths,
                 int32_t n1, int32_t n2) {
  const Path* best = nullptr;
  for (const Path& p : paths) {
    if ((p.start == std::min(n1, n2)) && (p.stop == std::max(n1, n2))) {
      if (!best || p.pix.size() < best->pix.size()) best = &p;
    }
  }
  if (!best) return;  // Python asserts; unreachable for emitted edges
  const int32_t new_node = best->pix[best->pix.size() / 2];
  std::vector<int32_t> out;
  out.reserve(nodes->size());
  out.push_back(new_node);
  for (int32_t n : *nodes)
    if (n != n1 && n != n2) out.push_back(n);
  nodes->swap(out);
}

int64_t pack_paths(const std::vector<Path>& paths, int32_t H, int32_t* path_lens,
                   int64_t lens_cap, int32_t* path_pix, int64_t pix_cap) {
  int64_t total = 0;
  for (const Path& p : paths) total += static_cast<int64_t>(p.pix.size());
  if (static_cast<int64_t>(paths.size()) > lens_cap || 2 * total > pix_cap)
    return -1;
  int64_t k = 0;
  for (size_t i = 0; i < paths.size(); ++i) {
    path_lens[i] = static_cast<int32_t>(paths[i].pix.size());
    for (int32_t id : paths[i].pix) {
      path_pix[2 * k] = id / H;      // x
      path_pix[2 * k + 1] = id % H;  // y
      ++k;
    }
  }
  return static_cast<int64_t>(paths.size());
}

}  // namespace

extern "C" {

// Single flood (parity surface for find_paths). Returns the path count and
// packs (x, y) pixel pairs, or -1 if output capacity is insufficient.
int64_t dsg_find_paths(const uint8_t* skel, int32_t W, int32_t H,
                       const int32_t* nodes_xy, int64_t n_nodes,
                       int32_t* path_lens, int64_t lens_cap,
                       int32_t* path_pix, int64_t pix_cap) {
  Flood f(skel, W, H);
  std::vector<int32_t> nodes(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i)
    nodes[i] = nodes_xy[2 * i] * H + nodes_xy[2 * i + 1];
  std::vector<Path> paths;
  f.find_paths(nodes, &paths);
  return pack_paths(paths, H, path_lens, lens_cap, path_pix, pix_cap);
}

// Full connect_graph inner loop: flood, then repeatedly merge the first
// edge shorter than min_distance and re-flood, up to max_merge_iters.
// Returns the final path count (packed as above) or -1 on capacity.
int64_t dsg_connect_paths(const uint8_t* skel, int32_t W, int32_t H,
                          const int32_t* nodes_xy, int64_t n_nodes,
                          int32_t min_distance, int32_t max_merge_iters,
                          int32_t* path_lens, int64_t lens_cap,
                          int32_t* path_pix, int64_t pix_cap,
                          int32_t* out_iters) {
  Flood f(skel, W, H);
  std::vector<int32_t> nodes(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i)
    nodes[i] = nodes_xy[2 * i] * H + nodes_xy[2 * i + 1];
  std::vector<Path> paths;
  f.find_paths(nodes, &paths);

  int32_t iters = 0;
  while (iters < max_merge_iters) {
    int64_t hit = -1;
    for (size_t i = 0; i < paths.size(); ++i) {
      if (static_cast<int32_t>(paths[i].pix.size()) - 1 < min_distance &&
          paths[i].start != paths[i].stop) {
        hit = static_cast<int64_t>(i);
        break;
      }
    }
    if (hit < 0) break;
    merge_nodes(&nodes, paths, paths[hit].start, paths[hit].stop);
    f.find_paths(nodes, &paths);
    ++iters;
  }
  if (out_iters) *out_iters = iters;
  return pack_paths(paths, H, path_lens, lens_cap, path_pix, pix_cap);
}

}  // extern "C"
