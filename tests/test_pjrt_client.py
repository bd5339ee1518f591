"""PJRT C++ client: executes the exported .stablehlo.mlir on a PJRT plugin.

The full-parity test needs the TPU relay plugin to be reachable; when the
relay is down (Client_Create blocks), the test SKIPs on timeout. The build
and argument/error paths are always exercised.
"""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

REPO = Path(__file__).parent.parent
AXON_SO = "/opt/axon/libaxon_pjrt.so"


def _build_client():
    subprocess.run(["make", "-C", str(REPO / "native"), "pjrt_client"],
                   check=True, capture_output=True)
    return REPO / "native" / "pjrt_client"


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
class TestPjrtClient:
    def test_builds_and_reports_usage(self):
        client = _build_client()
        proc = subprocess.run([str(client)], capture_output=True, text=True)
        assert proc.returncode == 2
        assert "usage:" in proc.stderr

    def test_bad_plugin_path_fails_cleanly(self, tmp_path):
        client = _build_client()
        for f in ("m.mlir", "in.bin"):
            (tmp_path / f).write_bytes(b"x" * 16)
        proc = subprocess.run(
            [str(client), "/nonexistent/plugin.so", str(tmp_path / "m.mlir"),
             str(tmp_path / "in.bin"), str(tmp_path / "out.bin")],
            capture_output=True, text=True)
        assert proc.returncode == 1
        assert "dlopen failed" in proc.stderr

    @pytest.mark.slow  # waits up to 7 min for the relay before skipping
    @pytest.mark.skipif(not Path(AXON_SO).exists(), reason="no axon plugin")
    def test_stablehlo_parity_on_tpu(self, tmp_path):
        """Full run against the relay TPU; skips when the relay is down."""
        client = _build_client()
        dump = tmp_path / "inputs"
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # dumper must not touch the relay
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run(
            [sys.executable, str(REPO / "examples/cpp_client/dump_pjrt_inputs.py"),
             str(dump), str(REPO / "tests/fixtures/tiny.yaml"), "96"],
            check=True, env=env, cwd=str(REPO), capture_output=True, text=True,
            timeout=600,
        )

        run_env = dict(os.environ)  # ambient env keeps the relay vars
        for line in (dump / "axon_env.txt").read_text().splitlines():
            if "=" in line:
                k, v = line.split("=", 1)
                run_env.setdefault(k, v)
        try:
            proc = subprocess.run(
                [str(client), AXON_SO, str(dump / "module.mlir"),
                 str(dump / "input.bin"), str(dump / "out.bin"),
                 "--options", str(dump / "axon_options.txt"),
                 "--compile-options", str(dump / "compile_options.bin")],
                capture_output=True, text=True, env=run_env, timeout=420)
        except subprocess.TimeoutExpired:
            pytest.skip("TPU relay unreachable (client timed out)")
        assert proc.returncode == 0, f"pjrt_client failed:\n{proc.stderr[-3000:]}"

        sys.path.insert(0, str(REPO / "examples/cpp_client"))
        from dump_pjrt_inputs import read_tensors

        (expected,) = read_tensors(dump / "expected.bin")
        outs = read_tensors(dump / "out.bin")
        assert len(outs) == 1 and outs[0].shape == expected.shape
        # (1, max_det, 6) xyxy conf cls from the exported fused predict
        np.testing.assert_allclose(outs[0], expected, rtol=1e-2, atol=1e-2)
