"""Analytic FLOP/MFU accounting (benchmarks/flops, VERDICT r2 item 3)."""

import sys

sys.path.insert(0, "/root/repo")

from benchmarks import flops as fl


def test_matmul_count_matches_kernel_structure():
    # attitude: 7 arm + 1 lag + 4 rp + 2 yaw + 3 vel + 3 pos = 20
    assert fl.solve_flops(256, 16, mode="attitude")["n_hh_matmuls"] == 20
    # wrench: 7 arm + 4 lag + 3 omega + 3 vel + 3 pos = 20
    assert fl.solve_flops(256, 16, mode="wrench")["n_hh_matmuls"] == 20
    # position: 7 arm + 6 response + 3 dmat = 16
    assert fl.solve_flops(256, 16, mode="position")["n_hh_matmuls"] == 16
    # no rotor lag drops the lag matmuls
    assert fl.solve_flops(256, 16, mode="wrench", rotor_lag=False)[
        "n_hh_matmuls"
    ] == 16


def test_matmul_flops_scaling():
    a = fl.solve_flops(1024, 50)["flops_matmul"]
    b = fl.solve_flops(2048, 50)["flops_matmul"]
    c = fl.solve_flops(1024, 100)["flops_matmul"]
    assert b == 2 * a          # linear in K
    assert c == 4 * a          # quadratic in H
    assert a == 2 * 20 * 50 * 50 * 1024


def test_annotate_and_peaks():
    st = fl.annotate(
        {"ms_per_solve": 1.0, "solves_per_s": 1000.0}, 4096, 50, "TPU v5e"
    )
    assert st["mfu_vs_bf16_peak"] is not None
    assert 0 < st["mfu_vs_bf16_peak"] < 1
    assert st["achieved_tflops"] == round(
        st["gflops_per_solve"] / 1e3 / 1e-3 / 1, 3
    )
    assert fl.peak_flops_for("TPU v4") == 275e12
    assert fl.peak_flops_for("unknown accelerator") is None
    st2 = fl.annotate(
        {"ms_per_solve": 1.0, "solves_per_s": 1000.0}, 4096, 50, "unknown"
    )
    assert st2["mfu_vs_bf16_peak"] is None
