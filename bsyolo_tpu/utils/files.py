"""File/path helpers (reference utils/files.py).

increment_path for run directories, spaces-in-path workaround, file age and
size introspection — the pieces the trainers and exporters lean on.
"""

from __future__ import annotations

import contextlib
import shutil
import tempfile
from datetime import datetime
from pathlib import Path
from typing import Union


def increment_path(path: Union[str, Path], exist_ok: bool = False, sep: str = "",
                   mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp{sep}2, {sep}3, ... (reference files.py:57)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not Path(p).exists():
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


@contextlib.contextmanager
def spaces_in_path(path: Union[str, Path]):
    """Work around tools that choke on spaces: copy to a temp path without
    spaces for the duration of the block (reference files.py:18)."""
    path = Path(path)
    if " " not in str(path):
        yield path
        return
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td) / path.name.replace(" ", "_")
        if path.is_dir():
            shutil.copytree(path, tmp)
        elif path.is_file():
            shutil.copy2(path, tmp)
        try:
            yield tmp
        finally:
            if tmp.is_dir():
                shutil.copytree(tmp, path, dirs_exist_ok=True)
            elif tmp.is_file():
                shutil.copy2(tmp, path)


def file_age(path: Union[str, Path]) -> int:
    """Days since last modification (reference files.py:94)."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_date(path: Union[str, Path]) -> str:
    """'2026-8-17' style modification date (reference files.py:101)."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path: Union[str, Path]) -> float:
    """Size in MB; directories are summed recursively (reference files.py:108)."""
    p = Path(path)
    mb = 1 << 20
    if p.is_file():
        return p.stat().st_size / mb
    if p.is_dir():
        return sum(f.stat().st_size for f in p.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent last.ckpt under search_dir, for resume=True
    (reference files.py:119)."""
    ckpts = sorted(Path(search_dir).rglob("last.ckpt"), key=lambda p: p.stat().st_mtime)
    return str(ckpts[-1]) if ckpts else ""
