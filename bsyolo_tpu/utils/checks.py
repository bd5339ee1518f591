"""Offline-capable environment/argument checks (reference utils/checks.py).

The reference mixes argument validation with network-dependent
install/download helpers; only the validation surface is meaningful in this
offline TPU image — the network verbs raise with a clear message instead of
silently downloading.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Optional, Sequence, Union


def parse_version(version: str = "0.0.0") -> tuple:
    """'2.0.1+cpu' -> (2, 0, 1) (reference checks.py parse_version)."""
    try:
        return tuple(int(x) for x in re.findall(r"\d+", version)[:3])
    except Exception:
        return (0, 0, 0)


def check_version(
    current: str = "0.0.0",
    required: str = "0.0.0",
    name: str = "version",
    hard: bool = False,
    verbose: bool = False,
) -> bool:
    """pip-style version constraint check (reference checks.py:174)."""
    if not current:
        return True
    if current[0].isalpha():  # package name passed: resolve its version
        try:
            import importlib.metadata

            current = importlib.metadata.version(current)
        except importlib.metadata.PackageNotFoundError:
            if hard:
                raise ModuleNotFoundError(f"{current} is required but not installed")
            return False
    if not required:
        return True
    c = parse_version(current)
    ok = True
    for constraint in required.split(","):
        m = re.match(r"([<>=!~]*)\s*([\d.]+\w*)", constraint.strip())
        if not m:
            continue
        op, ver = m.group(1) or ">=", parse_version(m.group(2))
        ok &= {
            "==": c == ver, "!=": c != ver, ">=": c >= ver, "<=": c <= ver,
            ">": c > ver, "<": c < ver, "~=": c[:2] == ver[:2] and c >= ver,
        }.get(op, c >= ver)
    if not ok:
        msg = f"{name} requires '{required}' but {current} is installed"
        if hard:
            raise AssertionError(msg)
        if verbose:
            from bsyolo_tpu.utils import LOGGER

            LOGGER.warning(msg)
    return bool(ok)


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, max_dim: int = 2, floor: int = 0):
    """Round image size up to a stride multiple (reference checks.py:120)."""
    stride = int(stride)
    one = isinstance(imgsz, int)
    sizes = [imgsz] if one else list(imgsz)
    if len(sizes) > max_dim:
        raise ValueError(f"imgsz={imgsz} has more than {max_dim} dimensions")
    out = [max(int(-(-x // stride)) * stride, floor) for x in sizes]
    if out != sizes:
        from bsyolo_tpu.utils import LOGGER

        LOGGER.warning(f"imgsz={sizes} must be a multiple of stride {stride}, updating to {out}")
    if one and min_dim == 1:
        return out[0]
    if len(out) == 1 and min_dim == 2:
        return [out[0], out[0]]
    return out


def check_suffix(file: Union[str, Sequence], suffix: Union[str, Sequence] = ".pt", msg: str = ""):
    """Assert file suffix(es) (reference checks.py check_suffix)."""
    if not file or not suffix:
        return
    if isinstance(suffix, str):
        suffix = (suffix,)
    for f in [file] if isinstance(file, (str, Path)) else file:
        s = Path(f).suffix.lower().strip()
        if s and s not in suffix:
            raise ValueError(f"{msg}{f} acceptable suffix is {suffix}, not {s}")


def check_file(file: str, suffix: str = "", hard: bool = True) -> str:
    """Resolve a local file (reference check_file minus the download verbs)."""
    if suffix:
        check_suffix(file, suffix)
    f = str(file).strip()
    if not f or Path(f).exists():
        return f
    if f.lower().startswith(("http://", "https://", "rtsp://", "rtmp://")):
        raise FileNotFoundError(
            f"'{f}' is a URL; downloads are unavailable in this offline environment"
        )
    # search the bundled cfg tree like the reference searches its package
    from bsyolo_tpu.cfg import CFG_ROOT

    hits = sorted(CFG_ROOT.rglob(Path(f).name))
    if hits:
        return str(hits[0])
    if hard:
        raise FileNotFoundError(f"'{f}' does not exist")
    return f


def check_yaml(file: str, suffix=(".yaml", ".yml"), hard: bool = True) -> str:
    """Resolve a YAML file (reference check_yaml)."""
    return check_file(file, suffix="", hard=hard) if str(file).endswith(suffix) else check_file(
        str(file) + ".yaml", hard=hard
    )


def check_is_path_safe(basedir: Union[str, Path], path: Union[str, Path]) -> bool:
    """True if path resolves inside basedir (reference check_is_path_safe).

    Compared on resolved path PARTS, not a string prefix — '/data/runs-evil'
    must not pass for base '/data/runs'."""
    base = Path(basedir).resolve()
    p = Path(path).resolve()
    return p == base or base in p.parents


def print_args(args: Optional[dict] = None):
    """Log {k: v} args compactly (reference print_args)."""
    from bsyolo_tpu.utils import LOGGER

    if args:
        LOGGER.info(", ".join(f"{k}={v}" for k, v in args.items()))
