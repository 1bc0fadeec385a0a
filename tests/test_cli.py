"""CLI wiring tests (SURVEY row 75, reference src/main.cpp): every
integrator and post flag must drive end-to-end through ``cli.main`` on a
tiny frame. These are wiring tests — image CONTENT is covered by goldens
and estimator cross-checks; here a broken flag path or import is the bug
class."""

import numpy as np
import pytest

from stratum_tpu import cli
from stratum_tpu.io import image as sio


def _run(tmp_path, *args, out_name="out.png"):
    out = tmp_path / out_name
    argv = [
        "--cpu", "--scene=cornell", "--width=32", "--height=32", "--spp=2",
        f"--out={out}", *args,
    ]
    rc = cli.main(argv)
    assert rc == 0
    img = sio.load_image(str(out))
    assert img.shape[0] == 32 and img.shape[1] == 32
    assert np.isfinite(img).all()
    return np.asarray(img)


def test_cli_path_default(tmp_path):
    img = _run(tmp_path, "--tonemap=aces")
    assert img.mean() > 0.005


def test_cli_direct(tmp_path):
    _run(tmp_path, "--integrator=direct")


def test_cli_light_trace(tmp_path):
    _run(tmp_path, "--integrator=lt")


def test_cli_bdpt(tmp_path):
    _run(tmp_path, "--integrator=bdpt", "--maxBounces=2")


def test_cli_bdpt_lvc_reuse(tmp_path):
    """--lvcConnections enables LVC reservoir connections; --lvcReuse
    threads the cross-frame reservoir state through the progressive loop
    (reference eLVCReservoirReuse)."""
    img = _run(
        tmp_path, "--integrator=bdpt", "--maxBounces=2",
        "--lvcConnections=2", "--lvcReuse",
    )
    assert img.mean() > 0.005


def test_cli_restir(tmp_path):
    _run(tmp_path, "--integrator=restir", "--ris=2")


def test_cli_adaptive_kron(tmp_path):
    _run(tmp_path, "--adaptive", "--sampler=kron", "--spp=4")


def test_cli_quality_preset(tmp_path):
    """--quality = kron sampler + shadow-ray RR + adaptive allocation (the
    measured time-to-quality composition, tools/quality_bench.py); pieces
    stay individually overridable."""
    img = _run(tmp_path, "--quality", "--spp=4")
    assert img.mean() > 0.005
    # override one piece: adaptive off pushes through the plain path
    _run(tmp_path, "--quality", "--adaptive=0", "--spp=4")


def test_cli_denoise_tonemap(tmp_path):
    _run(tmp_path, "--denoise", "--tonemap=filmic", "--autoexposure")


def test_cli_debug_view(tmp_path):
    _run(tmp_path, "--debug=normal")


def test_cli_spp_lanes(tmp_path):
    _run(tmp_path, "--sppLanes=2", "--spp=4")


def test_cli_hdr_output(tmp_path):
    out = tmp_path / "out.hdr"
    rc = cli.main([
        "--cpu", "--scene=cornell", "--width=32", "--height=32",
        "--spp=2", f"--out={out}",
    ])
    assert rc == 0
    img = sio.load_image(str(out))
    assert np.isfinite(img).all() and img.shape[:2] == (32, 32)


def test_cli_presample_coherent(tmp_path):
    _run(tmp_path, "--presampleLights=256", "--coherentTiles=16")


def test_cli_unknown_integrator_fails(tmp_path):
    with pytest.raises(ValueError):
        cli.main([
            "--cpu", "--scene=cornell", "--width=32", "--height=32",
            "--spp=1", "--integrator=nope",
            f"--out={tmp_path / 'x.png'}",
        ])


def test_cli_plugin_hook(tmp_path, monkeypatch):
    """--plugin=module imports the module and calls register(graph, opts)
    (reference: dynamic_library plugin loading, src/main.cpp:11-24)."""
    plug = tmp_path / "stratum_test_plugin.py"
    plug.write_text(
        "CALLS = []\n"
        "def register(graph, opts):\n"
        "    CALLS.append(graph.root.name)\n"
        "    graph.root.add_child('from_plugin')\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    out = tmp_path / "p.png"
    rc = cli.main([
        "--cpu", "--scene=cornell", "--width=32", "--height=32", "--spp=1",
        "--plugin=stratum_test_plugin", f"--out={out}",
    ])
    assert rc == 0
    import stratum_test_plugin

    assert stratum_test_plugin.CALLS == ["root"]


def test_cli_envmap_and_volume(tmp_path):
    """--envmap (equirect HDR light) and --volume (.vol medium) attach
    through the CLI build path (reference: Environment material +
    load_volumes, environment.h:48-93 / load_volumes.cpp:17-52)."""
    import numpy as np

    from stratum_tpu.scene.loaders.volumes import write_vol_grid

    env = np.zeros((8, 16, 3), np.float32)
    env[2, 5] = (4.0, 3.0, 2.0)  # one bright texel: importance tables built
    env_path = tmp_path / "sky.hdr"
    sio.save_image(str(env_path), env)
    vol_path = tmp_path / "fog.vol"
    write_vol_grid(
        vol_path, np.full((4, 4, 4), 0.002, np.float32),
        (100, 100, 100), (400, 400, 400),
    )
    img = _run(
        tmp_path, f"--envmap={env_path}", f"--volume={vol_path}",
        "--maxBounces=2",
    )
    assert img.mean() > 0
