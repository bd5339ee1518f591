"""Dump everything examples/cpp_client/pjrt_main.cpp needs for a run:

  <out>/module.mlir           StableHLO bytecode (params baked as constants)
  <out>/input.bin             u32 ndim, i64 dims, f32 data
  <out>/expected.bin          same framing, the jax-side reference output
  <out>/compile_options.bin   serialized default xla CompileOptionsProto
  <out>/axon_options.txt      PJRT client create-options for the axon relay
  <out>/axon_env.txt          env vars the axon registration path exports

The axon options/env are captured by running the real axon registration code
with jax's register_plugin spied out — so the C++ client gets byte-identical
create options to what Python JAX would use, without creating a client here.

Usage: python examples/cpp_client/dump_pjrt_inputs.py <out_dir> [model.yaml] [imgsz]
"""

import os
import sys
import struct
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def write_tensor(path, arr):
    arr = np.ascontiguousarray(arr, np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<I", arr.ndim))
        f.write(struct.pack(f"<{arr.ndim}q", *arr.shape))
        f.write(arr.tobytes())


def read_tensors(path):
    blob = Path(path).read_bytes()
    out, off = [], 0
    while off < len(blob):
        (ndim,) = struct.unpack_from("<I", blob, off)
        off += 4
        dims = struct.unpack_from(f"<{ndim}q", blob, off)
        off += 8 * ndim
        n = int(np.prod(dims)) if ndim else 1
        arr = np.frombuffer(blob, np.float32, n, off).reshape(dims)
        off += 4 * n
        out.append(arr)
    return out


def dump_axon_options(out_dir: Path):
    """Capture the axon plugin's create-options + env by spying on jax's
    register_plugin while the real axon.register code runs."""
    import uuid

    env_before = dict(os.environ)
    captured = {}

    import jax._src.xla_bridge as xb

    orig = xb.register_plugin

    def spy(name, *, library_path=None, options=None, **kw):
        captured.update(options or {})
        return None

    xb.register_plugin = spy
    try:
        from axon.register import register

        register(
            None,
            os.environ.get("PALLAS_AXON_TPU_GEN", "v5e") + ":1x1x1",
            so_path="/opt/axon/libaxon_pjrt.so",
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
        )
    finally:
        xb.register_plugin = orig

    lines = []
    for k, v in captured.items():
        if isinstance(v, bool):
            lines.append(f"{k}=i:{int(v)}")
        elif isinstance(v, int):
            lines.append(f"{k}=i:{v}")
        else:
            lines.append(f"{k}=s:{v}")
    (out_dir / "axon_options.txt").write_text("\n".join(lines) + "\n")
    env_lines = [
        f"{k}={v}" for k, v in os.environ.items() if env_before.get(k) != v
    ]
    (out_dir / "axon_env.txt").write_text("\n".join(env_lines) + "\n")
    return captured


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pjrt_inputs")
    model_yaml = sys.argv[2] if len(sys.argv) > 2 else "tests/fixtures/tiny.yaml"
    imgsz = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    out_dir.mkdir(parents=True, exist_ok=True)

    # options/env capture BEFORE touching jax devices (registration is spied)
    opts = dump_axon_options(out_dir)
    print(f"axon create-options: {sorted(opts)}")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from jaxlib import xla_client as xc

    (out_dir / "compile_options.bin").write_bytes(
        xc.CompileOptions().SerializeAsString()
    )

    from bsyolo_tpu import YOLO
    from bsyolo_tpu.engine.exporter import export_model, load_stablehlo

    m = YOLO(model_yaml)
    m._img_size = imgsz
    art = export_model(m, format="stablehlo", imgsz=imgsz,
                       output=str(out_dir / "model.stablehlo"))
    mlir = Path(art + ".mlir")
    mlir.replace(out_dir / "module.mlir")

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, imgsz, imgsz, 3)).astype(np.float32)
    write_tensor(out_dir / "input.bin", x)
    y = np.asarray(load_stablehlo(art)(x))
    write_tensor(out_dir / "expected.bin", y)
    print(f"dumped to {out_dir}: module.mlir ({mlir_size(out_dir)}B), "
          f"input {x.shape}, expected {y.shape}")


def mlir_size(out_dir):
    return (Path(out_dir) / "module.mlir").stat().st_size


if __name__ == "__main__":
    main()
