// Minimal boost::dynamic_bitset stand-in for the reference harness build.
// Surface limited to what the reference uses (ctor(n, val), set, test,
// resize, size; reference: src/haplotypecaller/ActiveRegion/ActiveMainThread.cpp:211,
// genotype/forward.h:67).
#ifndef ROVACA_SHIM_BOOST_DYNAMIC_BITSET_HPP
#define ROVACA_SHIM_BOOST_DYNAMIC_BITSET_HPP

// real boost pulls these in transitively; some reference sources rely on it
#include <algorithm>
#include <cassert>
#include <cstddef>
#include <cstring>
#include <vector>

namespace boost {

template <typename Block = unsigned long,
          typename Allocator = std::allocator<Block>>
class dynamic_bitset {
public:
    dynamic_bitset() = default;
    explicit dynamic_bitset(std::size_t n, unsigned long value = 0)
        : bits_(n, false)
    {
        for (std::size_t i = 0; i < n && i < 8 * sizeof(unsigned long); ++i) {
            if ((value >> i) & 1ul) bits_[i] = true;
        }
    }

    std::size_t size() const { return bits_.size(); }
    void resize(std::size_t n, bool value = false) { bits_.resize(n, value); }
    void clear() { bits_.clear(); }

    dynamic_bitset& set(std::size_t pos, bool value = true)
    {
        bits_[pos] = value;
        return *this;
    }
    dynamic_bitset& set()
    {
        bits_.assign(bits_.size(), true);
        return *this;
    }
    dynamic_bitset& reset(std::size_t pos)
    {
        bits_[pos] = false;
        return *this;
    }
    dynamic_bitset& reset()
    {
        bits_.assign(bits_.size(), false);
        return *this;
    }
    dynamic_bitset& flip(std::size_t pos)
    {
        bits_[pos] = !bits_[pos];
        return *this;
    }

    bool test(std::size_t pos) const { return bits_[pos]; }
    bool operator[](std::size_t pos) const { return bits_[pos]; }

    std::size_t count() const
    {
        std::size_t c = 0;
        for (bool b : bits_) c += b;
        return c;
    }
    bool any() const { return count() != 0; }
    bool none() const { return count() == 0; }

private:
    std::vector<bool> bits_;
};

}  // namespace boost

#endif
