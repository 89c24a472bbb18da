"""Smoke tests for every scripts/*.py CLI entry point (VERDICT r2 missing #2).

The scripts layer mirrors the reference's actual UX — its run loops live in
top-level scripts (reference CodeThatWorks/GoodColorReconstruction.py:568-685,
1camera-detectsSceneChanges.py:299-317) — so each one is subprocess-run here
headless on the synthetic backend at quarter scale with a tiny frame budget,
asserting rc == 0 plus the artifacts each workflow promises. These are
deliberately smoke-level: numerical behavior is covered by the unit /
pipeline tests; this file proves the CLI wiring (arg parsing, source
construction, saver paths, headless viewer) end to end.
"""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def run_script(name, *args, timeout=900):
    """Run scripts/<name> in a subprocess on the CPU backend; return rc/out."""
    env = dict(os.environ)
    # the scripts pass --cpu themselves (jax.config.update before compute);
    # the env var additionally keeps any import-time backend probe off the
    # TPU so smoke tests never contend for the real chip
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, os.path.join(SCRIPTS, name), *args],
                       capture_output=True, text=True, timeout=timeout,
                       cwd=REPO, env=env)
    assert r.returncode == 0, (
        f"{name} rc={r.returncode}\nstdout:\n{r.stdout[-2000:]}\n"
        f"stderr:\n{r.stderr[-4000:]}")
    return r


QUICK = ("--source", "synthetic", "--scale", "0.25", "--headless", "--cpu")


@pytest.fixture(scope="module")
def results_dir(tmp_path_factory):
    """One live_mono run shared by the tests that need saved results."""
    out = str(tmp_path_factory.mktemp("results"))
    run_script("live_mono.py", *QUICK, "--frames", "4",
               "--voxel", "0.02", "--output", out)
    return out


@pytest.fixture(scope="module")
def cloud_ply(tmp_path_factory):
    """One depth_to_cloud run providing a PLY for cloud_to_mesh."""
    out = str(tmp_path_factory.mktemp("clouds"))
    run_script("depth_to_cloud.py", *QUICK, "--frames", "2",
               "--save-every", "1", "--record", "--output", out)
    plys = glob.glob(os.path.join(out, "*cloud*.ply"))
    assert plys, os.listdir(out)
    # --record must also have produced the npz frame log (replay fodder)
    assert glob.glob(os.path.join(out, "frames", "*.npz"))
    return plys[0]


def test_live_mono_saves_reconstruction(results_dir):
    """Mono SLAM loop: mesh + cloud + trajectory + preview on exit
    (reference 1camera-detectsSceneChanges.py save path :243-291)."""
    names = os.listdir(results_dir)
    for kind in ("mesh", "volume_pcd", "trajectory", "preview"):
        assert any(kind in n for n in names), (kind, names)


@pytest.mark.slow
def test_live_mono_streaming_mode(tmp_path):
    """--streaming routes the volume through the host-streaming manager
    (tsdf/streaming.py; exactness is unit-tested in test_streaming.py — this
    proves the CLI wiring end to end, incl. the assembled-mesh save path)."""
    r = run_script("live_mono.py", *QUICK, "--frames", "4",
                   "--voxel", "0.02", "--streaming",
                   "--output", str(tmp_path))
    assert "streaming: reload<" in r.stdout + r.stderr
    names = os.listdir(str(tmp_path))
    assert any("mesh" in n for n in names), names


@pytest.mark.slow
def test_live_mono_serve_mode(tmp_path):
    """--serve runs the live loop against the browser viewer (HTTP server in
    place of the Open3D window; endpoint behavior is unit-tested in
    test_live_server.py — this proves the CLI wiring end to end)."""
    r = run_script("live_mono.py", "--source", "synthetic", "--scale", "0.25",
                   "--cpu", "--serve", "0", "--frames", "3",
                   "--voxel", "0.02", "--output", str(tmp_path))
    assert "live viewer serving at http://" in r.stdout + r.stderr


def test_view_results_lists_latest(results_dir):
    r = run_script("view_results.py", "--mode", "latest",
                   "--dir", results_dir, "--list-only")
    assert "newest result" in r.stdout + r.stderr


def test_view_results_html_export(results_dir, tmp_path):
    """--html writes the self-contained WebGL viewer for the newest mesh
    (first-party replacement for the reference's Open3D window viewers)."""
    out = str(tmp_path / "viewer.html")
    r = run_script("view_results.py", "--mode", "mesh",
                   "--dir", results_dir, "--html", out)
    assert "HTML viewer written" in r.stdout + r.stderr
    html = open(out).read()
    assert "webgl" in html and 'pos: "' in html
    assert os.path.getsize(out) > 10_000  # geometry actually embedded


def test_depth_to_cloud_and_cloud_to_mesh(cloud_ply, tmp_path):
    """PLY -> mesh conversion via the first-party SDF mesher (reference
    PointCloudToMesh.py without the Open3D dependency)."""
    out = str(tmp_path / "mesh.ply")
    run_script("cloud_to_mesh.py", cloud_ply, out,
               "--voxel", "0.02", "--method", "sdf", "--cpu")
    assert os.path.getsize(out) > 0


def test_cloud_to_mesh_ball_pivot(cloud_ply, tmp_path):
    """--method ballpivot drives the first-party BPA end-to-end (the
    reference's fallback rung, PointCloudToMesh.py:139-148, runnable with no
    Open3D in the image). The fixed reference ladder tops out at 4 cm, which
    comfortably spans the 2 cm preprocess downsample spacing."""
    out = str(tmp_path / "mesh_bp.ply")
    run_script("cloud_to_mesh.py", cloud_ply, out,
               "--voxel", "0.02", "--method", "ballpivot", "--cpu")
    assert os.path.getsize(out) > 0


@pytest.mark.slow
def test_dual_fusion_auto_calibration(tmp_path):
    """Two-camera fusion with FPFH auto-calibration
    (reference BetterVisualizer2CamWorksROTATEsave2.py)."""
    out = str(tmp_path)
    run_script("dual_fusion.py", *QUICK, "--frames", "3",
               "--voxel", "0.02", "--output", out)
    names = os.listdir(out)
    assert any("merged" in n for n in names), names  # merged display cloud
    assert any("mesh" in n for n in names), names


@pytest.mark.slow
def test_calibrate_rig_then_dual_fusion_consumes_it(tmp_path):
    """The checkerboard rig-calibration workflow end to end: board views ->
    Zhang intrinsics -> stereo extrinsic -> rig JSON, then dual_fusion
    --rig-calib loads it instead of auto-calibrating (reference
    InitialReconstruction-CUDA-2cam:306-487,542-623)."""
    calib = str(tmp_path / "calibration")
    r = run_script("calibrate_rig.py", "--source", "synthetic", "--cpu",
                   "--views", "8", "--calib-dir", calib)
    assert glob.glob(os.path.join(calib, "rig_*.json"))
    assert "baseline" in r.stdout + r.stderr
    out = str(tmp_path / "results")
    r2 = run_script("dual_fusion.py", *QUICK, "--frames", "2",
                    "--voxel", "0.02", "--output", out,
                    "--rig-calib", calib)
    assert "rig calibration loaded" in r2.stdout + r2.stderr


@pytest.mark.slow
def test_fragments(tmp_path):
    out = str(tmp_path)
    run_script("fragments.py", *QUICK, "--frames", "6", "--voxel", "0.02",
               "--capture-every", "2", "--output", out)
    assert any("fragments_mesh" in n for n in os.listdir(out)), os.listdir(out)


@pytest.mark.slow
def test_offline_bundle_and_resume(tmp_path):
    """Record -> finalize, then --resume picks the frame log back up
    (checkpoint/resume, SURVEY §5)."""
    out = str(tmp_path)
    run_script("offline_bundle.py", *QUICK, "--frames", "3",
               "--voxel", "0.02", "--output", out)
    r = run_script("offline_bundle.py", *QUICK, "--frames", "3",
                   "--voxel", "0.02", "--output", out, "--resume")
    assert "resumed with" in r.stdout + r.stderr


@pytest.mark.slow
def test_record_reconstruction(tmp_path):
    out = str(tmp_path)
    run_script("record_reconstruction.py", *QUICK, "--frames", "3",
               "--voxel", "0.02", "--output", out, "--autostart")
    assert any(n.endswith(".ply") for n in os.listdir(out)), os.listdir(out)


def test_live_viewer_headless():
    run_script("live_viewer.py", *QUICK, "--frames", "2", "--position-colors")


def test_device_test():
    r = run_script("device_test.py", "--source", "synthetic", "--cpu")
    assert "device matmul OK" in r.stdout


def test_generate_checkerboard(tmp_path):
    out = str(tmp_path)
    run_script("generate_checkerboard.py", "--output", out, "--sizes", "60")
    assert glob.glob(os.path.join(out, "*.npy")) or glob.glob(
        os.path.join(out, "*.p*m")) or os.listdir(out)


def test_eval_trajectory_scores_synthetic_run(results_dir):
    """live_mono on the synthetic source saves a ground-truth trajectory
    next to the estimate; eval_trajectory.py must score the pair and the
    4-frame quarter-scale run must track to sub-centimeter ATE."""
    import json

    est = os.path.join(results_dir, "latest_trajectory.txt")
    gt = os.path.join(results_dir, "latest_gt_trajectory.txt")
    assert os.path.exists(gt), os.listdir(results_dir)
    r = run_script("eval_trajectory.py", est, gt, "--json")
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["n_poses"] == 5  # initial identity + 4 frames
    assert m["ate_rmse_m"] < 0.01, m
    assert m["rpe_rot_rmse_deg"] < 1.0, m
    # human-readable mode exercises the other formatting path
    r2 = run_script("eval_trajectory.py", est, gt)
    assert "ATE rmse" in r2.stdout


def test_cloud_accumulate_saves_model(tmp_path):
    """The reference's Reconstruction.py workflow as a CLI: accumulate a
    registered global cloud from keyframes, save the normal-oriented
    colored model on exit."""
    out = str(tmp_path)
    run_script("cloud_accumulate.py", *QUICK, "--frames", "6",
               "--keyframe-interval", "2", "--output", out)
    names = os.listdir(out)
    assert any("model" in n and n.endswith(".ply") for n in names), names
