"""Derive an implementation-independent STAPLE golden case (VERDICT r4 #5).

The reference's STAPLE baseline is ITK's C++ filter (`consensus.ipynb` cell
5:13-26); neither SimpleITK nor the ITK test suite is available in this
environment (no network). The strongest external anchor constructible here is
the published algorithm itself: this script transcribes the binary STAPLE EM
update equations exactly as published in

    Warfield, Zou, Wells, "Simultaneous Truth and Performance Level
    Estimation (STAPLE): An Algorithm for the Validation of Image
    Segmentation", IEEE TMI 23(7):903-921, 2004 —
    E-step: W_j = a_j / (a_j + b_j), with
            a_j = g * prod_i p_i^{d_ij} (1-p_i)^{1-d_ij}
            b_j = (1-g) * prod_i q_i^{1-d_ij} (1-q_i)^{d_ij}
    M-step: p_i = sum_j W_j d_ij / sum_j W_j
            q_i = sum_j (1-W_j)(1-d_ij) / sum_j (1-W_j)

and evaluates them in 80-digit decimal arithmetic (no logs, no floats, no
imports from `deep_staple_tpu`) on a fixed 3-rater / 100-voxel decision
matrix, from the ITK initialization conventions the rebuild documents
(sensitivity = specificity = 0.99999, spatially-uniform prior
g = mean over raters and voxels of the decisions). Every operation is
+,-,*,/ on Decimals, so the printed fixed point is exact to far beyond
float32: it depends only on the published update map, not on any
implementation in this repository.

The printed constants are vendored as literals in
tests/test_consensus.py::test_staple_matches_published_equations_fixed_point,
which gates `consensus/staple.py` (and the Pallas/C++ twins via their
existing bit-cross-checks) against them.

Usage: python benchmarks/staple_golden_derivation.py
"""

from __future__ import annotations

from decimal import Decimal, getcontext

getcontext().prec = 80

# Decision-pattern histogram: (d_rater0, d_rater1, d_rater2) -> voxel count.
# 100 voxels; conceptually ~40 foreground with rater 0 oversegmenting,
# rater 1 undersegmenting, rater 2 noisy — a well-conditioned, non-degenerate
# EM problem (no rater is perfect, no pattern is empty).
PATTERNS = [
    ((1, 1, 1), 25),
    ((1, 1, 0), 8),
    ((1, 0, 1), 5),
    ((0, 1, 1), 2),
    ((1, 0, 0), 4),
    ((0, 1, 0), 3),
    ((0, 0, 1), 6),
    ((0, 0, 0), 47),
]
R = 3
V = sum(c for _, c in PATTERNS)
assert V == 100

D1 = Decimal(1)


def em_fixed_point(max_iters: int = 2000, tol: Decimal = Decimal("1e-60")):
    # ITK-convention initialization (itkSTAPLEImageFilter public defaults,
    # documented in deep_staple_tpu/consensus/staple.py's docstring):
    p = [Decimal("0.99999")] * R
    q = [Decimal("0.99999")] * R
    # g = ConfidenceWeight(=1) * mean(D) over raters and voxels.
    total_ones = sum(sum(pat) * c for pat, c in PATTERNS)
    g = Decimal(total_ones) / Decimal(R * V)

    iters = 0
    for it in range(max_iters):
        # E-step (eq. above) per unique pattern.
        w_pat = []
        for pat, _count in PATTERNS:
            a = g
            b = D1 - g
            for i in range(R):
                if pat[i]:
                    a *= p[i]
                    b *= D1 - q[i]
                else:
                    a *= D1 - p[i]
                    b *= q[i]
            w_pat.append(a / (a + b))
        # M-step.
        w_sum = sum(w * Decimal(c) for w, (_, c) in zip(w_pat, PATTERNS))
        one_minus_w_sum = Decimal(V) - w_sum
        new_p, new_q = [], []
        for i in range(R):
            wd = sum(
                w * Decimal(c)
                for w, (pat, c) in zip(w_pat, PATTERNS)
                if pat[i]
            )
            omw_omd = sum(
                (D1 - w) * Decimal(c)
                for w, (pat, c) in zip(w_pat, PATTERNS)
                if not pat[i]
            )
            new_p.append(wd / w_sum)
            new_q.append(omw_omd / one_minus_w_sum)
        delta = sum(abs(a - b) for a, b in zip(new_p, p)) + sum(
            abs(a - b) for a, b in zip(new_q, q)
        )
        p, q = new_p, new_q
        iters = it + 1
        if delta < tol:
            break
    return p, q, w_pat, g, iters


def main():
    p, q, w_pat, g, iters = em_fixed_point()
    print(f"# Derived from the published STAPLE EM equations (Warfield 2004)")
    print(f"# in 80-digit decimal arithmetic; converged (|dp|+|dq| < 1e-60) "
          f"after {iters} iterations.")
    print(f"prior_g = {float(g)!r}")
    print(f"sensitivities = {[float(x) for x in p]!r}")
    print(f"specificities = {[float(x) for x in q]!r}")
    print("posterior_by_pattern = {")
    for w, (pat, c) in zip(w_pat, PATTERNS):
        print(f"    {pat!r}: {float(w)!r},  # {c} voxels, consensus={int(w > Decimal('0.5'))}")
    print("}")


if __name__ == "__main__":
    main()
