/* Minimal GSL-compatible statistics shims for building the REFERENCE
 * mashmap binary as a golden-output test oracle (GSL itself is not
 * installed in this environment). Only the three entry points the
 * reference uses are provided:
 *   gsl_cdf_binomial_Q       (map_stats.hpp)
 *   gsl_ran_hypergeometric_pdf, gsl_cdf_hypergeometric_P (computeMap.hpp)
 * Implemented with lgamma-based log-pmf sums (exact enough for the
 * integer threshold searches these feed).
 */
#ifndef MASHMAP_TPU_GSL_STUB_CDF_H
#define MASHMAP_TPU_GSL_STUB_CDF_H

#include <cmath>

static inline double gsl_stub_binom_pmf(unsigned k, double p, unsigned n) {
    if (p <= 0.0) return k == 0 ? 1.0 : 0.0;
    if (p >= 1.0) return k == n ? 1.0 : 0.0;
    double lp = std::lgamma((double)n + 1.0) - std::lgamma((double)k + 1.0)
        - std::lgamma((double)(n - k) + 1.0)
        + (double)k * std::log(p) + (double)(n - k) * std::log1p(-p);
    return std::exp(lp);
}

/* P(X > k) for X ~ Binomial(n, p) */
static inline double gsl_cdf_binomial_Q(unsigned k, double p, unsigned n) {
    if (k >= n) return 0.0;
    /* sum the smaller tail for accuracy */
    double mean = n * p;
    if ((double)k + 1.0 > mean) {
        double s = 0.0;
        for (unsigned i = k + 1; i <= n; i++) s += gsl_stub_binom_pmf(i, p, n);
        return s < 0.0 ? 0.0 : (s > 1.0 ? 1.0 : s);
    }
    double s = 0.0;
    for (unsigned i = 0; i <= k; i++) s += gsl_stub_binom_pmf(i, p, n);
    double q = 1.0 - s;
    return q < 0.0 ? 0.0 : (q > 1.0 ? 1.0 : q);
}

#endif
