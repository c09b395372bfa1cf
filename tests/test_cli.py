"""CLI smoke tests: every subcommand end-to-end at tiny sizes."""

import os

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")
import matplotlib.image as mpimg  # noqa: E402

from light_path_tracer_tpu.cli import main, build_parser  # noqa: E402


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_parser_reference_flags():
    """The reference's exact flags (image_lens.py:519-532) parse."""
    p = build_parser()
    args = p.parse_args(["lens", "--M", "2.0", "--a", "0.5",
                         "--r-obs", "80", "--psi-y", "1.5",
                         "--psi-x", "-2.0", "--fov-v", "30"])
    assert args.M == 2.0 and args.a == 0.5 and args.r_obs == 80.0
    assert args.psi_y == 1.5 and args.psi_x == -2.0 and args.fov_v == 30.0


def test_no_command_shows_help(capsys):
    assert main([]) == 2


def test_max_steps_flag_plumbs_into_render_config():
    from light_path_tracer_tpu.cli import _render_cfg_from
    p = build_parser()
    args = p.parse_args(["shadow", "--max-steps", "6000"])
    assert _render_cfg_from(args).max_steps == 6000
    args = p.parse_args(["shadow"])
    assert _render_cfg_from(args).max_steps == 200000


def test_cli_shadow_analytic(workdir):
    rc = main(["shadow", "--size", "48", "--analytic",
               "--output", "s.png"])
    assert rc == 0 and os.path.exists("s.png")


@pytest.mark.slow
def test_cli_shadow_integrated(workdir):
    rc = main(["shadow", "--size", "32", "--a", "0.8", "--dtype",
               "float64", "--output", "s.png"])
    assert rc == 0 and os.path.exists("s.png")


def test_cli_lens_with_cache(workdir):
    src = np.random.default_rng(0).random((24, 32, 3)).astype(np.float32)
    mpimg.imsave("src.png", src)
    rc = main(["lens", "--image", "src.png", "--output", "l.png",
               "--cache"])
    assert rc == 0 and os.path.exists("l.png")
    assert os.path.isdir("lookup_cache")
    rc = main(["lens", "--image", "src.png", "--output", "l2.png",
               "--cache"])   # hit path
    assert rc == 0 and os.path.exists("l2.png")
    a = mpimg.imread("l.png")
    b = mpimg.imread("l2.png")
    np.testing.assert_array_equal(a, b)


def test_cli_disk(workdir):
    rc = main(["disk", "--a", "0.9", "--size", "32",
               "--inclination", "80", "--dtype", "float64",
               "--output", "d.png"])
    assert rc == 0 and os.path.exists("d.png")


@pytest.mark.slow
def test_cli_disk_decompose(workdir, capsys):
    rc = main(["disk", "--a", "0.0", "--size", "48",
               "--inclination", "70", "--fov-v", "14",
               "--decompose", "dec.png", "--orders", "2"])
    assert rc == 0 and os.path.exists("dec.png")
    out = capsys.readouterr().out
    assert "Decomposition:" in out and "n=1" in out


def test_cli_ray_and_plot(workdir):
    rc = main(["ray", "--alpha-deg", "8", "--r-obs", "50",
               "--output", "r.png"])
    assert rc == 0 and os.path.exists("r.png")
    rc = main(["plot", "--angles", "4,8", "--r-obs", "50",
               "--output", "p.png"])
    assert rc == 0 and os.path.exists("p.png")


def test_cli_orbit(workdir, capsys):
    rc = main(["orbit", "--a", "0.9", "--peri", "5", "--apo", "12",
               "--steps", "1500", "--output", "o.png"])
    assert rc == 0 and os.path.exists("o.png")
    out = capsys.readouterr().out
    assert "Periapsis advance per orbit" in out
    assert "Hamiltonian residual" in out
    # Inclined circular orbit reports the Lense-Thirring node drift.
    rc = main(["orbit", "--a", "0.9", "--r", "8", "--inclination", "10",
               "--steps", "1500", "--no-plot"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Ascending-node drift" in out
    # JP deformation is rejected with a clear error, not wrong physics.
    assert main(["orbit", "--eps3", "0.2", "--no-plot"]) == 2


def test_cli_shadow_aa(workdir):
    rc = main(["shadow", "--size", "32", "--a", "0.9", "--aa", "2",
               "--dtype", "float64", "--output", "saa.png"])
    assert rc == 0 and os.path.exists("saa.png")


def test_cli_lens_aa(workdir):
    src = np.full((24, 32, 3), 0.4, np.float32)
    mpimg.imsave("bg.png", src)
    rc = main(["lens", "--image", "bg.png", "--a", "0.9", "--aa", "2",
               "--dtype", "float64", "--output", "laa.png"])
    assert rc == 0 and os.path.exists("laa.png")


@pytest.mark.slow
def test_cli_composite_aa(workdir):
    src = np.full((24, 32, 3), 0.4, np.float32)
    mpimg.imsave("bg.png", src)
    rc = main(["lens", "--image", "bg.png", "--a", "0.9", "--theta-obs",
               "80", "--disk", "--aa", "2", "--dtype", "float64",
               "--output", "caa.png"])
    assert rc == 0 and os.path.exists("caa.png")


@pytest.mark.slow
def test_cli_animate_flyby(workdir):
    """`animate --flyby R0:R1 --boost-to B` writes a GIF; the traced
    (r_obs, boost) carry makes every frame after the first one
    dispatch (sequence.render_flyby)."""
    rc = main(["animate", "--a", "0.9", "--size", "24", "--frames", "3",
               "--flyby", "100:40", "--boost-to", "0.3",
               "--output", "fly.gif"])
    assert rc == 0 and os.path.exists("fly.gif")


def test_cli_animate_flyby_bad_spec(workdir):
    assert main(["animate", "--size", "16", "--frames", "2",
                 "--flyby", "oops"]) == 2


@pytest.mark.slow
def test_cli_device_and_x64_flags(workdir, tmp_path):
    """--device cpu + --dtype float64 must run on the CPU backend with
    x64 actually enabled (no silent float32 truncation). Subprocess:
    both configs are process-global and the test session already sets
    them in-process."""
    import subprocess, sys, os
    out = tmp_path / "s.png"
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
        __file__)))
    r = subprocess.run(
        [sys.executable, "-m", "light_path_tracer_tpu", "shadow",
         "--device", "cpu", "--dtype", "float64", "--size", "24",
         "--a", "0.5", "--output", str(out)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=repo_root)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    assert "truncated to dtype float32" not in r.stderr


@pytest.mark.slow
def test_cli_lens_magnification(workdir):
    from light_path_tracer_tpu.cli import main
    out = workdir / "mag.png"
    rc = main(["lens", "--magnification", str(out), "--size", "48",
               "--fov-v", "40", "--a", "0.5"])
    assert rc == 0 and out.exists()


def test_cli_lens_shear(workdir):
    from light_path_tracer_tpu.cli import main
    out = workdir / "shear.png"
    rc = main(["lens", "--shear", str(out), "--size", "48",
               "--fov-v", "40", "--a", "0.5"])
    assert rc == 0 and out.exists()


@pytest.mark.slow
def test_cli_lens_find_images(workdir, capsys):
    from light_path_tracer_tpu.cli import main
    theta_e_deg = np.degrees(np.sqrt(4.0 / 1000.0))
    rc = main(["lens", "--r-obs", "1000", "--fov-v", "40",
               "--size", "96", "--find-images", f"{theta_e_deg},0"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "2 images" in text and "delay[M]" in text
    # Malformed beta is a usage error, not a traceback.
    assert main(["lens", "--find-images", "nope"]) == 2


@pytest.mark.slow
def test_cli_volumetric_absorbed(workdir):
    rc = main(["volumetric", "--size", "24", "--a", "0.9",
               "--theta-obs", "80", "--alpha0", "0.2",
               "--output", "v.png"])
    assert rc == 0 and os.path.exists("v.png")


@pytest.mark.slow
def test_cli_volumetric_jet(workdir):
    rc = main(["volumetric", "--size", "24", "--a", "0.9",
               "--theta-obs", "70", "--profile", "jet",
               "--jet-beta", "0.5", "--index", "-1.0",
               "--output", "jet.png"])
    assert rc == 0 and os.path.exists("jet.png")


@pytest.mark.slow
def test_cli_star_image_and_pulse(workdir):
    rc = main(["star", "--size", "24", "--radius", "5", "--omega",
               "0.02", "--fov-v", "8", "--output", "ns.png"])
    assert rc == 0 and os.path.exists("ns.png")
    rc = main(["star", "--size", "24", "--radius", "5", "--period",
               "400", "--spot", "90,0,15,1.0", "--pulse-profile", "8",
               "--fov-v", "8", "--output", "pulse.npz"])
    assert rc == 0 and os.path.exists("pulse.npz")
    d = np.load("pulse.npz")
    assert d["flux"].shape == (8,) and np.isfinite(d["flux"]).all()
    assert os.path.exists("pulse.png")


def test_cli_shadow_visibility(workdir):
    rc = main(["shadow", "--size", "96", "--analytic", "--fov-v", "16",
               "--output", "s.png", "--visibility", "vis.npz"])
    assert rc == 0 and os.path.exists("vis.npz")
    d = np.load("vis.npz")
    # First null found and the recovered diameter is in the right
    # ballpark of 2*alpha_crit (analytic shadow at r_obs=100M).
    assert np.isfinite(d["b_null"])
    from light_path_tracer_tpu.models import make_metric
    true = 2.0 * make_metric(1.0, 0.0, 0.0).alpha_crit(100.0)
    assert abs(float(d["diameter_rad"]) - true) / true < 0.1
