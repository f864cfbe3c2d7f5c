"""label_cov_power_iteration (int64 fixed-point, oracle-checked) must
agree with label_cov_top_eigen_float (numpy/applyInPandas) on the
same spectra.

The two differ by design in two bounded ways:
- normalization: the moments path divides by (n-1) (sample covariance),
  numpy by n (population) — an exact (n-1)/n factor;
- convergence: 12 fixed-point rounds at 1e-4 iterate granularity vs 30
  float rounds — a few percent on near-isotropic per-label matrices
  (lambda2/lambda1 close to 1 is the slowest case for power iteration).

After the (n-1)/n correction the traces must match to ~1e-3 and the
eigenvalues to a few percent; top_share is normalization-invariant.
"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    from datalakes_and_data_integration_spark.plans.curation3 import (
        label_cov_power_iteration,
    )
    from datalakes_and_data_integration_spark.plans.similarity_extra import (
        label_cov_top_eigen_float,
    )

    fixed = {
        r["label"]: r for r in label_cov_power_iteration(spark, SF).collect()
    }
    fl = {r["label"]: r for r in label_cov_top_eigen_float(spark, SF).collect()}
    return fixed, fl


def test_same_labels_and_counts(results):
    fixed, fl = results
    assert set(fixed) == set(fl) and len(fixed) == 10
    for lab in fixed:
        assert fixed[lab]["n_vectors"] == fl[lab]["n_vectors"]


def test_trace_matches_after_bias_correction(results):
    fixed, fl = results
    for lab in fixed:
        n = fixed[lab]["n_vectors"]
        corrected = fixed[lab]["trace"] * (n - 1) / n
        assert corrected == pytest.approx(fl[lab]["trace"], rel=1e-3)


def test_eigenvalue_within_convergence_band(results):
    fixed, fl = results
    for lab in fixed:
        n = fixed[lab]["n_vectors"]
        corrected = fixed[lab]["top_eigenvalue"] * (n - 1) / n
        assert corrected == pytest.approx(
            fl[lab]["top_eigenvalue"], rel=0.06
        ), f"label {lab}"
        assert abs(fixed[lab]["top_share"] - fl[lab]["top_share"]) < 0.01
