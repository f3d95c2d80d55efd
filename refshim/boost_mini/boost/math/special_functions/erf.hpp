// Minimal boost::math::erf_inv for the reference harness build.
// Acklam-style rational initial estimate for the probit, refined with two
// Halley iterations against std::erf — full double precision on (-1, 1).
// (Same construction as rovaca_tpu/ops/gatk_math.py's native erf_inv.)
#ifndef ROVACA_SHIM_BOOST_MATH_ERF_HPP
#define ROVACA_SHIM_BOOST_MATH_ERF_HPP

#include <cmath>
#include <limits>

namespace boost {
namespace math {

namespace shim_detail {

// Inverse of the standard normal CDF (Acklam's rational approximation).
inline double probit_estimate(double p)
{
    static const double a[] = {-3.969683028665376e+01, 2.209460984245205e+02,
                               -2.759285104469687e+02, 1.383577518672690e+02,
                               -3.066479806614716e+01, 2.506628277459239e+00};
    static const double b[] = {-5.447609879822406e+01, 1.615858368580409e+02,
                               -1.556989798598866e+02, 6.680131188771972e+01,
                               -1.328068155288572e+01};
    static const double c[] = {-7.784894002430293e-03, -3.223964580411365e-01,
                               -2.400758277161838e+00, -2.549732539343734e+00,
                               4.374664141464968e+00,  2.938163982698783e+00};
    static const double d[] = {7.784695709041462e-03, 3.224671290700398e-01,
                               2.445134137142996e+00, 3.754408661907416e+00};
    const double plow = 0.02425, phigh = 1 - plow;
    double q, r;
    if (p < plow) {
        q = std::sqrt(-2 * std::log(p));
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q +
                c[5]) /
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1);
    }
    if (p > phigh) {
        q = std::sqrt(-2 * std::log(1 - p));
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q +
                 c[5]) /
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1);
    }
    q = p - 0.5;
    r = q * q;
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r +
            a[5]) *
           q /
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1);
}

}  // namespace shim_detail

inline double erf_inv(double x)
{
    if (x <= -1)
        return -std::numeric_limits<double>::infinity();
    if (x >= 1)
        return std::numeric_limits<double>::infinity();
    if (x == 0)
        return 0.0;
    // erf_inv(x) = probit((x+1)/2) / sqrt(2)
    static const double s_sqrt2 = 1.4142135623730951;
    double y = shim_detail::probit_estimate(0.5 * (x + 1)) / s_sqrt2;
    // Halley refinement on f(y) = erf(y) - x:
    //   f' = 2/sqrt(pi) e^{-y^2},  f''/f' = -2y
    static const double two_over_sqrt_pi = 1.1283791670955126;
    for (int it = 0; it < 2; ++it) {
        double err = std::erf(y) - x;
        double deriv = two_over_sqrt_pi * std::exp(-y * y);
        double u = err / deriv;
        y -= u / (1 + y * u);  // Halley step
    }
    return y;
}

}  // namespace math
}  // namespace boost

#endif
