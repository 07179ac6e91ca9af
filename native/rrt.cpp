// Native RRT-Connect / RRT* for data generation.
//
// The data-gen pipeline's host-side bottleneck is the sample-based planner's
// per-extend loop (mmd_tpu/datagen/rrt.py). This is the C++ runtime
// equivalent: the same box-SDF collision world (max-coordinate box SDF,
// matching mmd_tpu/envs/primitives.py and the reference primitives.py:223),
// the same scaled-workspace margins, exposed through a flat C ABI consumed
// via ctypes (mmd_tpu/datagen/native_rrt.py).
//
// Deterministic per-call RNG (splitmix64) so runs reproduce from a seed.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct World {
    const double* boxes;       // (n_boxes, 2) centers
    const double* half_sizes;  // (n_boxes, 2)
    int n_boxes;
    double lo[2], hi[2];       // workspace walls scaled 1.08x about center
    double qlo[2], qhi[2];     // configuration limits
    double margin;             // 1.1*r + cutoff

    double sdf(const double* q) const {
        if (n_boxes == 0) return 1e6;
        double best = 1e30;
        for (int i = 0; i < n_boxes; ++i) {
            double dx = std::fabs(q[0] - boxes[2 * i]) - half_sizes[2 * i];
            double dy = std::fabs(q[1] - boxes[2 * i + 1]) - half_sizes[2 * i + 1];
            double d = dx > dy ? dx : dy;  // max-coordinate box SDF
            if (d < best) best = d;
        }
        return best;
    }

    bool in_collision(const double* q) const {
        if (q[0] < qlo[0] || q[0] > qhi[0] || q[1] < qlo[1] || q[1] > qhi[1])
            return true;
        if (q[0] - lo[0] < margin || hi[0] - q[0] < margin ||
            q[1] - lo[1] < margin || hi[1] - q[1] < margin)
            return true;
        return sdf(q) < margin;
    }

    bool segment_free(const double* a, const double* b, double step) const {
        double dx = b[0] - a[0], dy = b[1] - a[1];
        double dist = std::sqrt(dx * dx + dy * dy);
        int n = (int)std::ceil(dist / step) + 1;
        if (n < 2) n = 2;
        for (int i = 0; i < n; ++i) {
            double t = (double)i / (n - 1);
            double q[2] = {a[0] + t * dx, a[1] + t * dy};
            if (in_collision(q)) return false;
        }
        return true;
    }
};

struct Rng {
    uint64_t s;
    explicit Rng(uint64_t seed) : s(seed + 0x9E3779B97F4A7C15ULL) {}
    uint64_t next() {
        uint64_t z = (s += 0x9E3779B97F4A7C15ULL);
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
        z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
        return z ^ (z >> 31);
    }
    double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

struct Tree {
    std::vector<double> pts;   // (n, 2)
    std::vector<int> parent;
    std::vector<double> cost;

    int add(const double* q, int par, double c) {
        pts.push_back(q[0]);
        pts.push_back(q[1]);
        parent.push_back(par);
        cost.push_back(c);
        return (int)parent.size() - 1;
    }
    int nearest(const double* q) const {
        int best = 0;
        double bd = 1e30;
        for (size_t i = 0; i < parent.size(); ++i) {
            double dx = pts[2 * i] - q[0], dy = pts[2 * i + 1] - q[1];
            double d = dx * dx + dy * dy;
            if (d < bd) { bd = d; best = (int)i; }
        }
        return best;
    }
};

double dist2d(const double* a, const double* b) {
    double dx = a[0] - b[0], dy = a[1] - b[1];
    return std::sqrt(dx * dx + dy * dy);
}

void steer(const double* from, const double* to, double radius, double* out) {
    double d = dist2d(from, to);
    if (d <= radius) { out[0] = to[0]; out[1] = to[1]; return; }
    out[0] = from[0] + (to[0] - from[0]) / d * radius;
    out[1] = from[1] + (to[1] - from[1]) / d * radius;
}

void sample_free(const World& w, Rng& rng, double* q) {
    for (int tries = 0; tries < 100000; ++tries) {
        q[0] = w.qlo[0] + rng.uniform() * (w.qhi[0] - w.qlo[0]);
        q[1] = w.qlo[1] + rng.uniform() * (w.qhi[1] - w.qlo[1]);
        if (!w.in_collision(q)) return;
    }
}

int retrace(const Tree& t, int idx, std::vector<double>& out, bool reverse) {
    std::vector<int> chain;
    for (int i = idx; i != -1; i = t.parent[i]) chain.push_back(i);
    if (!reverse) {
        for (auto it = chain.rbegin(); it != chain.rend(); ++it) {
            out.push_back(t.pts[2 * *it]);
            out.push_back(t.pts[2 * *it + 1]);
        }
    } else {
        for (int i : chain) {
            out.push_back(t.pts[2 * i]);
            out.push_back(t.pts[2 * i + 1]);
        }
    }
    return (int)chain.size();
}

World make_world(const double* boxes, const double* half_sizes, int n_boxes,
                 const double* qlim, double margin) {
    World w;
    w.boxes = boxes;
    w.half_sizes = half_sizes;
    w.n_boxes = n_boxes;
    w.qlo[0] = qlim[0]; w.qlo[1] = qlim[1];
    w.qhi[0] = qlim[2]; w.qhi[1] = qlim[3];
    // Scale the workspace box about its center (correct for asymmetric
    // limits; equals the old limit*1.08 when limits are symmetric).
    for (int d = 0; d < 2; ++d) {
        double c = 0.5 * (qlim[d] + qlim[2 + d]);
        double half = 0.5 * (qlim[2 + d] - qlim[d]) * 1.08;
        w.lo[d] = c - half;
        w.hi[d] = c + half;
    }
    w.margin = margin;
    return w;
}

}  // namespace

extern "C" {

// Returns number of waypoints written to out_path (2 doubles each); 0 = no
// solution; -1 = invalid endpoints.
int rrt_connect_plan(const double* boxes, const double* half_sizes, int n_boxes,
                     const double* qlim, double margin, double step_size,
                     double n_radius, int n_iters, uint64_t seed,
                     const double* start, const double* goal,
                     double* out_path, int max_pts) {
    World w = make_world(boxes, half_sizes, n_boxes, qlim, margin);
    if (w.in_collision(start) || w.in_collision(goal)) return -1;
    if (w.segment_free(start, goal, step_size)) {
        out_path[0] = start[0]; out_path[1] = start[1];
        out_path[2] = goal[0]; out_path[3] = goal[1];
        return 2;
    }
    Rng rng(seed);
    Tree ta, tb;
    ta.add(start, -1, 0.0);
    tb.add(goal, -1, 0.0);
    bool swapped = false;

    for (int it = 0; it < n_iters; ++it) {
        double q_rand[2];
        sample_free(w, rng, q_rand);
        int near = ta.nearest(q_rand);
        double q_new[2];
        steer(&ta.pts[2 * near], q_rand, n_radius, q_new);
        if (!w.in_collision(q_new) &&
            w.segment_free(&ta.pts[2 * near], q_new, step_size)) {
            int ia = ta.add(q_new, near, 0.0);
            // Connect: greedily extend tb toward q_new.
            int last = -1;
            while (true) {
                int nb = tb.nearest(q_new);
                double q_ext[2];
                steer(&tb.pts[2 * nb], q_new, n_radius, q_ext);
                if (w.in_collision(q_ext) ||
                    !w.segment_free(&tb.pts[2 * nb], q_ext, step_size))
                    break;
                last = tb.add(q_ext, nb, 0.0);
                if (dist2d(q_ext, q_new) < 1e-9) {
                    std::vector<double> path;
                    if (!swapped) {
                        retrace(ta, ia, path, false);
                        retrace(tb, last, path, true);
                    } else {
                        retrace(tb, last, path, false);
                        retrace(ta, ia, path, true);
                    }
                    int n = (int)path.size() / 2;
                    if (n > max_pts) n = max_pts;
                    std::memcpy(out_path, path.data(), n * 2 * sizeof(double));
                    return n;
                }
            }
        }
        std::swap(ta, tb);
        swapped = !swapped;
    }
    return 0;
}

int rrt_star_plan(const double* boxes, const double* half_sizes, int n_boxes,
                  const double* qlim, double margin, double step_size,
                  double n_radius, double rewire_radius, int n_iters,
                  uint64_t seed, const double* start, const double* goal,
                  double* out_path, int max_pts) {
    World w = make_world(boxes, half_sizes, n_boxes, qlim, margin);
    if (w.in_collision(start) || w.in_collision(goal)) return -1;
    Rng rng(seed);
    Tree t;
    t.add(start, -1, 0.0);

    for (int it = 0; it < n_iters; ++it) {
        double q_rand[2];
        if (rng.uniform() < 0.1) { q_rand[0] = goal[0]; q_rand[1] = goal[1]; }
        else sample_free(w, rng, q_rand);

        int near = t.nearest(q_rand);
        double q_new[2];
        steer(&t.pts[2 * near], q_rand, n_radius, q_new);
        if (w.in_collision(q_new) ||
            !w.segment_free(&t.pts[2 * near], q_new, step_size))
            continue;

        // Best parent within the rewire radius.
        int best_parent = near;
        double best_cost = t.cost[near] + dist2d(&t.pts[2 * near], q_new);
        std::vector<int> neighbors;
        for (size_t j = 0; j < t.parent.size(); ++j) {
            double d = dist2d(&t.pts[2 * j], q_new);
            if (d < rewire_radius) {
                neighbors.push_back((int)j);
                double c = t.cost[j] + d;
                if (c < best_cost && w.segment_free(&t.pts[2 * j], q_new, step_size)) {
                    best_parent = (int)j;
                    best_cost = c;
                }
            }
        }
        int idx = t.add(q_new, best_parent, best_cost);

        // Rewire neighbors through the new node.
        for (int j : neighbors) {
            double c = best_cost + dist2d(q_new, &t.pts[2 * j]);
            if (c < t.cost[j] && w.segment_free(q_new, &t.pts[2 * j], step_size)) {
                t.parent[j] = idx;
                t.cost[j] = c;
            }
        }

        if (dist2d(q_new, goal) < n_radius &&
            w.segment_free(q_new, goal, step_size)) {
            int g = t.add(goal, idx, best_cost + dist2d(q_new, goal));
            std::vector<double> path;
            retrace(t, g, path, false);
            int n = (int)path.size() / 2;
            if (n > max_pts) n = max_pts;
            std::memcpy(out_path, path.data(), n * 2 * sizeof(double));
            return n;
        }
    }
    return 0;
}

}  // extern "C"
