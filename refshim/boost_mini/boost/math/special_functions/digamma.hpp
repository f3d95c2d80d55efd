// Minimal boost::math::digamma for the reference harness build.
// Upward recurrence into the asymptotic (Bernoulli) series region —
// standard construction, accurate to ~1e-15 for real x > 0 (the reference
// calls it on positive integer allele counts only;
// reference: src/haplotypecaller/common/utils/math_utils.h:205).
#ifndef ROVACA_SHIM_BOOST_MATH_DIGAMMA_HPP
#define ROVACA_SHIM_BOOST_MATH_DIGAMMA_HPP

#include <cmath>

namespace boost {
namespace math {

inline double digamma(double x)
{
    double result = 0.0;
    // recurrence: psi(x) = psi(x+1) - 1/x, shift into x >= 10
    while (x < 10.0) {
        result -= 1.0 / x;
        x += 1.0;
    }
    // asymptotic: psi(x) ~ ln x - 1/(2x) - sum B_2n / (2n x^{2n})
    double inv = 1.0 / x, inv2 = inv * inv;
    result += std::log(x) - 0.5 * inv;
    result -= inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252 -
              inv2 * (1.0 / 240 - inv2 * (1.0 / 132)))));
    return result;
}

inline double digamma(int x) { return digamma(static_cast<double>(x)); }

}  // namespace math
}  // namespace boost

#endif
