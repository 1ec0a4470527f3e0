"""End-to-end accuracy regression through the real DFW eval chain
(VERDICT r03 item 2): synthetic DFW -> trained stages -> the production
generate_predictions / generate_matrix / roc_precompute / get_stats
path, asserting the figure-3 improvement ordering on the REAL metrics
(extends tests/test_active.py::TestAblationOrdering from balanced-
accuracy ordering to the actual AUC/EER/GAR chain).

Reference: utilities/create_figure_3.m (M2-before 75.62 < A-LINK 88.72
overall GAR), getStats.py:9-25 for the statistic definitions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.tools.eval_regression import run_eval_regression

D = 64
SIZE = 16


@pytest.fixture(scope="module")
def artifact():
    W = jax.random.normal(jax.random.PRNGKey(0), (SIZE * SIZE * 3, D)) / 30.0

    @jax.jit
    def feat(imgs):
        x = imgs.reshape(imgs.shape[0], -1) / 255.0
        return x @ W

    return run_eval_regression(
        None, num_people=6, test_people=4, image_size=SIZE,
        featurize=feat, feature_res=D, n_steps=512, m2_n_steps=96,
        dig_epochs=1, undig_epochs=8,
        noise_bank=("gaussian", "speckle"), seed=7, verbose=False)


@pytest.mark.slow
class TestEvalRegression:
    def test_chain_shape(self, artifact):
        assert artifact["chain"] == ["generate_predictions",
                                     "generate_matrix", "roc_precompute",
                                     "get_stats"]
        for stage in ("pre", "alink", "a2link"):
            for case in ("impersonation", "obfuscation", "overall"):
                s = artifact["stages"][stage][case]
                assert 0.0 <= s["auc"] <= 1.0
                assert 0.0 <= s["eer"] <= 1.0
                assert s["n_genuine"] > 0 and s["n_imposter"] > 0

    def test_loops_actually_queried(self, artifact):
        assert artifact["stages"]["alink"]["overall"]["oracle_queries"] > 0
        assert artifact["stages"]["a2link"]["overall"]["oracle_queries"] > 0

    def test_improvement_ordering(self, artifact):
        """The figure-3 claim on the real metric chain: active learning
        improves the student's held-out verification ROC."""
        pre = artifact["stages"]["pre"]["overall"]
        alink = artifact["stages"]["alink"]["overall"]
        a2link = artifact["stages"]["a2link"]["overall"]
        assert alink["auc"] > pre["auc"], (pre, alink)
        assert a2link["auc"] > pre["auc"], (pre, a2link)
        assert alink["eer"] <= pre["eer"]
        assert a2link["eer"] <= pre["eer"]
        assert alink["gar_at_1pct_far"] >= pre["gar_at_1pct_far"]

    def test_improvement_ordering_per_case(self, artifact):
        """The paper reports impersonation and obfuscation SEPARATELY
        (create_figure_3.m) — an overall-only check let EVAL_r04's
        obfuscation AUC regression pass unnoticed (VERDICT r4 #3).
        Demand no per-case regression for either arm."""
        for case in ("impersonation", "obfuscation"):
            pre = artifact["stages"]["pre"][case]
            for arm in ("alink", "a2link"):
                got = artifact["stages"][arm][case]
                assert got["auc"] > pre["auc"], (case, arm, pre, got)
                assert artifact["ordering"][f"{arm}_auc_gt_pre_{case}"]

    def test_equal_budget_baseline_recorded(self, artifact):
        """The classical-AL baseline arm runs at EXACTLY the alink arm's
        oracle budget, and the committee-driven selection must do at
        least as well as plain uncertainty sampling on overall AUC."""
        base = artifact["stages"]["existing_al"]["overall"]
        alink = artifact["stages"]["alink"]["overall"]
        assert base["oracle_queries"] == alink["oracle_queries"]
        assert artifact["ordering"]["alink_auc_ge_existing_al"], (
            base, alink)

    def test_ordering_flags_recorded(self, artifact):
        assert artifact["ordering"]["alink_auc_gt_pre"] is True
        assert artifact["ordering"]["a2link_auc_gt_pre"] is True
