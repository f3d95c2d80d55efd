// Minimal boost::math::binomial_coefficient for the reference harness build.
// Used only for small genotype-count enumeration (reference:
// src/haplotypecaller/genotype/genotype_num_likelihoods_cache.hpp:40-49),
// so an exact multiplicative evaluation suffices.
#ifndef ROVACA_SHIM_BOOST_MATH_BINOMIAL_HPP
#define ROVACA_SHIM_BOOST_MATH_BINOMIAL_HPP

namespace boost {
namespace math {

template <typename T>
inline T binomial_coefficient(unsigned n, unsigned k)
{
    if (k > n) return T(0);
    if (k > n - k) k = n - k;
    T result = 1;
    for (unsigned i = 1; i <= k; ++i) {
        result = result * T(n - k + i) / T(i);
    }
    return result;
}

}  // namespace math
}  // namespace boost

#endif
