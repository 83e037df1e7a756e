/* Hypergeometric pmf/cdf shims — see gsl_cdf.h for context. */
#ifndef MASHMAP_TPU_GSL_STUB_RANDIST_H
#define MASHMAP_TPU_GSL_STUB_RANDIST_H

#include <cmath>

static inline double gsl_stub_lchoose(double n, double k) {
    if (k < 0 || k > n) return -INFINITY;
    return std::lgamma(n + 1.0) - std::lgamma(k + 1.0)
        - std::lgamma(n - k + 1.0);
}

/* P(K = k) drawing t from population of n1 tagged + n2 untagged */
static inline double gsl_ran_hypergeometric_pdf(unsigned k, unsigned n1,
                                                unsigned n2, unsigned t) {
    double lp = gsl_stub_lchoose(n1, k)
        + gsl_stub_lchoose(n2, (double)t - (double)k)
        - gsl_stub_lchoose((double)n1 + n2, t);
    return std::isfinite(lp) ? std::exp(lp) : 0.0;
}

/* P(K <= k) */
static inline double gsl_cdf_hypergeometric_P(unsigned k, unsigned n1,
                                              unsigned n2, unsigned t) {
    double s = 0.0;
    for (unsigned i = 0; i <= k; i++)
        s += gsl_ran_hypergeometric_pdf(i, n1, n2, t);
    return s > 1.0 ? 1.0 : s;
}

#endif
