// Minimal, self-contained stand-in for the nanoflann single-header kd-tree
// library, covering exactly the subset the DynEarthSol reference uses
// (parameters.hpp, knn.cxx, mesh.cxx, markerset.cxx, brc-/nn-interpolation.cxx).
// Used only to build the reference binary for golden-output generation; not
// part of the dynearthsol_tpu package.
//
// Exact k-nearest-neighbour search via a median-split kd-tree with
// branch-and-bound pruning; results are sorted ascending by squared L2
// distance, matching nanoflann's KNNResultSet contract.
#ifndef NANOFLANN_SHIM_HPP
#define NANOFLANN_SHIM_HPP

#include <algorithm>
#include <cstddef>
#include <limits>
#include <vector>

namespace nanoflann {

template <typename DistT>
class KNNResultSet {
public:
    explicit KNNResultSet(std::size_t capacity)
        : capacity_(capacity), count_(0), indices_(0), dists_(0) {}

    void init(std::size_t* indices, DistT* dists) {
        indices_ = indices;
        dists_ = dists;
        count_ = 0;
    }

    std::size_t size() const { return count_; }
    bool full() const { return count_ == capacity_; }

    DistT worstDist() const {
        return full() ? dists_[capacity_ - 1]
                      : std::numeric_limits<DistT>::max();
    }

    // Insert (dist, index) keeping the arrays sorted ascending by dist.
    void addPoint(DistT dist, std::size_t index) {
        std::size_t i;
        for (i = count_; i > 0; --i) {
            if (dists_[i - 1] > dist) {
                if (i < capacity_) {
                    dists_[i] = dists_[i - 1];
                    indices_[i] = indices_[i - 1];
                }
            } else {
                break;
            }
        }
        if (i < capacity_) {
            dists_[i] = dist;
            indices_[i] = index;
        }
        if (count_ < capacity_) ++count_;
    }

private:
    std::size_t capacity_;
    std::size_t count_;
    std::size_t* indices_;
    DistT* dists_;
};

struct SearchParameters {
    explicit SearchParameters(float eps = 0, bool sorted = true) {
        (void)eps;
        (void)sorted;
    }
};
typedef SearchParameters SearchParams;  // older nanoflann spelling

struct KDTreeSingleIndexAdaptorParams {
    explicit KDTreeSingleIndexAdaptorParams(std::size_t leaf_max_size = 10)
        : leaf_max_size(leaf_max_size) {}
    std::size_t leaf_max_size;
};

template <typename T, class Dataset>
struct L2_Simple_Adaptor {
    typedef T ElementType;
    typedef T DistanceType;
};

template <class Distance, class Dataset, int DIM>
class KDTreeSingleIndexAdaptor {
public:
    typedef typename Distance::ElementType ElementType;

    KDTreeSingleIndexAdaptor(int dim, const Dataset& dataset,
                             KDTreeSingleIndexAdaptorParams params =
                                 KDTreeSingleIndexAdaptorParams())
        : dataset_(dataset), dim_(dim), leaf_max_(params.leaf_max_size),
          built_(false) {}

    void buildIndex() {
        const std::size_t n = dataset_.kdtree_get_point_count();
        index_.resize(n);
        for (std::size_t i = 0; i < n; ++i) index_[i] = i;
        nodes_.clear();
        nodes_.reserve(n / leaf_max_ * 2 + 4);
        if (n > 0) build_node(0, n);
        built_ = true;
    }

    template <class ResultSet>
    bool findNeighbors(ResultSet& result, const ElementType* query,
                       SearchParameters = SearchParameters()) const {
        if (!built_ || index_.empty()) return false;
        search_node(0, 0, index_.size(), query, result);
        return result.size() > 0;
    }

private:
    struct Node {
        int split_dim;        // -1 for leaf
        ElementType split_val;
        std::size_t left_child, right_child;  // node ids (internal only)
        std::size_t mid;                      // split position in index_
    };

    // Build the node covering index_[begin, end); returns its id in nodes_.
    std::size_t build_node(std::size_t begin, std::size_t end) {
        const std::size_t id = nodes_.size();
        nodes_.push_back(Node());
        if (end - begin <= leaf_max_) {
            nodes_[id].split_dim = -1;
            return id;
        }
        // Split on the dimension with the widest extent, at the median.
        int best_dim = 0;
        ElementType best_spread = -1;
        for (int d = 0; d < dim_; ++d) {
            ElementType lo = dataset_.kdtree_get_pt(index_[begin], d);
            ElementType hi = lo;
            for (std::size_t i = begin + 1; i < end; ++i) {
                ElementType v = dataset_.kdtree_get_pt(index_[i], d);
                if (v < lo) lo = v;
                if (v > hi) hi = v;
            }
            if (hi - lo > best_spread) {
                best_spread = hi - lo;
                best_dim = d;
            }
        }
        const std::size_t mid = begin + (end - begin) / 2;
        DimCompare cmp = {&dataset_, best_dim};
        std::nth_element(index_.begin() + begin, index_.begin() + mid,
                         index_.begin() + end, cmp);
        nodes_[id].split_dim = best_dim;
        nodes_[id].split_val = dataset_.kdtree_get_pt(index_[mid], best_dim);
        nodes_[id].mid = mid;
        const std::size_t left = build_node(begin, mid);
        const std::size_t right = build_node(mid, end);
        nodes_[id].left_child = left;
        nodes_[id].right_child = right;
        return id;
    }

    template <class ResultSet>
    void search_node(std::size_t id, std::size_t begin, std::size_t end,
                     const ElementType* query, ResultSet& result) const {
        const Node& node = nodes_[id];
        if (node.split_dim < 0) {
            for (std::size_t i = begin; i < end; ++i) {
                const std::size_t pt = index_[i];
                ElementType d2 = 0;
                for (int d = 0; d < dim_; ++d) {
                    const ElementType diff =
                        query[d] - dataset_.kdtree_get_pt(pt, d);
                    d2 += diff * diff;
                }
                if (d2 < result.worstDist()) result.addPoint(d2, pt);
            }
            return;
        }
        const ElementType delta = query[node.split_dim] - node.split_val;
        if (delta < 0) {
            search_node(node.left_child, begin, node.mid, query, result);
            if (delta * delta < result.worstDist())
                search_node(node.right_child, node.mid, end, query, result);
        } else {
            search_node(node.right_child, node.mid, end, query, result);
            if (delta * delta < result.worstDist())
                search_node(node.left_child, begin, node.mid, query, result);
        }
    }

    struct DimCompare {
        const Dataset* ds;
        int dim;
        bool operator()(std::size_t a, std::size_t b) const {
            return ds->kdtree_get_pt(a, dim) < ds->kdtree_get_pt(b, dim);
        }
    };

    const Dataset& dataset_;
    const int dim_;
    const std::size_t leaf_max_;
    bool built_;
    std::vector<std::size_t> index_;
    std::vector<Node> nodes_;
};

}  // namespace nanoflann

#endif  // NANOFLANN_SHIM_HPP
