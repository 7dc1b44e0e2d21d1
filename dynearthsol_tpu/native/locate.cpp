// Native host-side geometry kernels: kd-tree kNN and point-in-simplex
// location.  These replace the reference's nanoflann (CPU kd-tree) and
// knn-bvh (GPU LBVH) dependencies (knn.cxx:27-185) for the remap/marker
// paths, which are the host-side hot spots during remeshing.
//
// C ABI, loaded from Python via ctypes (native.py).  Built with:
//   g++ -O3 -march=native -shared -fPIC locate.cpp -o _native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct KDTree {
    int dim;
    int n;
    std::vector<double> pts;   // (n, dim) copied
    std::vector<int> perm;     // kd order -> original index
    // implicit balanced tree over perm[lo, hi)
    void build(const double* p, int n_, int dim_) {
        dim = dim_;
        n = n_;
        pts.assign(p, p + (size_t)n * dim);
        perm.resize(n);
        for (int i = 0; i < n; ++i) perm[i] = i;
        build_range(0, n, 0);
    }
    void build_range(int lo, int hi, int axis) {
        if (hi - lo <= 1) return;
        int mid = (lo + hi) / 2;
        const double* base = pts.data();
        int d = dim, ax = axis;
        std::nth_element(perm.begin() + lo, perm.begin() + mid,
                         perm.begin() + hi,
                         [base, d, ax](int a, int b) {
                             return base[(size_t)a * d + ax]
                                  < base[(size_t)b * d + ax];
                         });
        int next = (axis + 1) % dim;
        build_range(lo, mid, next);
        build_range(mid + 1, hi, next);
    }

    struct Heap {  // max-heap of (d2, idx), size <= k
        int k;
        int size = 0;
        std::vector<double> d2;
        std::vector<int> idx;
        explicit Heap(int k_) : k(k_), d2(k_), idx(k_) {}
        double worst() const {
            return size < k ? std::numeric_limits<double>::infinity()
                            : d2[0];
        }
        void push(double dd, int ii) {
            if (size < k) {
                d2[size] = dd;
                idx[size] = ii;
                ++size;
                int c = size - 1;
                while (c > 0) {
                    int par = (c - 1) / 2;
                    if (d2[par] >= d2[c]) break;
                    std::swap(d2[par], d2[c]);
                    std::swap(idx[par], idx[c]);
                    c = par;
                }
            } else if (dd < d2[0]) {
                d2[0] = dd;
                idx[0] = ii;
                int par = 0;
                for (;;) {
                    int l = 2 * par + 1, r = 2 * par + 2, big = par;
                    if (l < size && d2[l] > d2[big]) big = l;
                    if (r < size && d2[r] > d2[big]) big = r;
                    if (big == par) break;
                    std::swap(d2[par], d2[big]);
                    std::swap(idx[par], idx[big]);
                    par = big;
                }
            }
        }
    };

    void query_range(const double* q, int lo, int hi, int axis,
                     Heap& heap) const {
        if (hi <= lo) return;
        int mid = (lo + hi) / 2;
        int i = perm[mid];
        const double* p = &pts[(size_t)i * dim];
        double dd = 0;
        for (int d = 0; d < dim; ++d) {
            double dv = p[d] - q[d];
            dd += dv * dv;
        }
        heap.push(dd, i);
        double diff = q[axis] - p[axis];
        int next = (axis + 1) % dim;
        if (diff <= 0) {
            query_range(q, lo, mid, next, heap);
            if (diff * diff < heap.worst())
                query_range(q, mid + 1, hi, next, heap);
        } else {
            query_range(q, mid + 1, hi, next, heap);
            if (diff * diff < heap.worst())
                query_range(q, lo, mid, next, heap);
        }
    }
};

// barycentric coordinates of point x within simplex elem e; returns eta
// (npe entries); matches barycentric-fn.cxx Cramer solves
inline bool bary_coords(const double* coord, const int32_t* conn_e,
                        const double* x, int dim, double* eta,
                        double tol) {
    if (dim == 2) {
        const double* a = &coord[(size_t)conn_e[0] * 2];
        const double* b = &coord[(size_t)conn_e[1] * 2];
        const double* c = &coord[(size_t)conn_e[2] * 2];
        double m00 = a[0] - c[0], m01 = b[0] - c[0];
        double m10 = a[1] - c[1], m11 = b[1] - c[1];
        double det = m00 * m11 - m01 * m10;
        if (det == 0) return false;
        double rx = x[0] - c[0], rz = x[1] - c[1];
        double e0 = (rx * m11 - rz * m01) / det;
        double e1 = (m00 * rz - m10 * rx) / det;
        eta[0] = e0;
        eta[1] = e1;
        eta[2] = 1.0 - e0 - e1;
        return eta[0] >= tol && eta[1] >= tol && eta[2] >= tol;
    }
    const double* a = &coord[(size_t)conn_e[0] * 3];
    const double* b = &coord[(size_t)conn_e[1] * 3];
    const double* c = &coord[(size_t)conn_e[2] * 3];
    const double* d = &coord[(size_t)conn_e[3] * 3];
    double m[3][3], r[3];
    for (int i = 0; i < 3; ++i) {
        m[i][0] = a[i] - d[i];
        m[i][1] = b[i] - d[i];
        m[i][2] = c[i] - d[i];
        r[i] = x[i] - d[i];
    }
    double det = m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
               - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
               + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
    if (det == 0) return false;
    double inv = 1.0 / det;
    double e0 = inv * (r[0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                     - m[0][1] * (r[1] * m[2][2] - m[1][2] * r[2])
                     + m[0][2] * (r[1] * m[2][1] - m[1][1] * r[2]));
    double e1 = inv * (m[0][0] * (r[1] * m[2][2] - m[1][2] * r[2])
                     - r[0] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                     + m[0][2] * (m[1][0] * r[2] - r[1] * m[2][0]));
    double e2 = inv * (m[0][0] * (m[1][1] * r[2] - r[1] * m[2][1])
                     - m[0][1] * (m[1][0] * r[2] - r[1] * m[2][0])
                     + r[0] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]));
    eta[0] = e0;
    eta[1] = e1;
    eta[2] = e2;
    eta[3] = 1.0 - e0 - e1 - e2;
    return eta[0] >= tol && eta[1] >= tol && eta[2] >= tol && eta[3] >= tol;
}

}  // namespace

extern "C" {

void* kdtree_build(const double* pts, int n, int dim) {
    KDTree* t = new KDTree();
    t->build(pts, n, dim);
    return t;
}

void kdtree_free(void* tp) { delete static_cast<KDTree*>(tp); }

void kdtree_query(const void* tp, const double* q, int nq, int k,
                  int32_t* out_idx, double* out_d2) {
    const KDTree* t = static_cast<const KDTree*>(tp);
    k = std::min(k, t->n);
#pragma omp parallel for schedule(static)
    for (int i = 0; i < nq; ++i) {
        KDTree::Heap heap(k);
        t->query_range(&q[(size_t)i * t->dim], 0, t->n, 0, heap);
        // heap-sort ascending
        std::vector<std::pair<double, int>> v(heap.size);
        for (int j = 0; j < heap.size; ++j)
            v[j] = {heap.d2[j], heap.idx[j]};
        std::sort(v.begin(), v.end());
        for (int j = 0; j < k; ++j) {
            out_idx[(size_t)i * k + j] = v[j].second;
            out_d2[(size_t)i * k + j] = v[j].first;
        }
    }
}

// Locate pts in the mesh: kd-tree over element centroids seeds `k`
// candidates; containment tested with barycentric coords; fallback =
// nearest centroid with clamped eta (brc-interpolation.cxx:291-322).
void locate_points(const double* coord, int nnode, const int32_t* conn,
                   int nelem, int dim, const double* pts, int npts, int k,
                   double tol, int64_t* out_elem, double* out_eta,
                   uint8_t* out_found) {
    (void)nnode;
    const int npe = dim + 1;
    std::vector<double> cent((size_t)nelem * dim);
    for (int e = 0; e < nelem; ++e) {
        for (int d = 0; d < dim; ++d) {
            double s = 0;
            for (int j = 0; j < npe; ++j)
                s += coord[(size_t)conn[(size_t)e * npe + j] * dim + d];
            cent[(size_t)e * dim + d] = s / npe;
        }
    }
    KDTree tree;
    tree.build(cent.data(), nelem, dim);
    k = std::min(k, nelem);

#pragma omp parallel for schedule(static)
    for (int i = 0; i < npts; ++i) {
        const double* x = &pts[(size_t)i * dim];
        KDTree::Heap heap(k);
        tree.query_range(x, 0, tree.n, 0, heap);
        std::vector<std::pair<double, int>> cand(heap.size);
        for (int j = 0; j < heap.size; ++j)
            cand[j] = {heap.d2[j], heap.idx[j]};
        std::sort(cand.begin(), cand.end());

        double eta[4];
        bool found = false;
        for (auto& ce : cand) {
            int e = ce.second;
            if (bary_coords(coord, &conn[(size_t)e * npe], x, dim, eta,
                            tol)) {
                out_elem[i] = e;
                for (int j = 0; j < npe; ++j)
                    out_eta[(size_t)i * npe + j] = eta[j];
                out_found[i] = 1;
                found = true;
                break;
            }
        }
        if (!found) {
            int e = cand[0].second;
            bary_coords(coord, &conn[(size_t)e * npe], x, dim, eta,
                        -std::numeric_limits<double>::infinity());
            double sum = 0;
            for (int j = 0; j < npe; ++j) {
                eta[j] = std::max(eta[j], 0.0);
                sum += eta[j];
            }
            for (int j = 0; j < npe; ++j)
                out_eta[(size_t)i * npe + j] = (sum > 0) ? eta[j] / sum
                                                         : 1.0 / npe;
            out_elem[i] = e;
            out_found[i] = 0;
        }
    }
}

}  // extern "C"
