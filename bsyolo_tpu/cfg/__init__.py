"""Config system (maps reference ultralytics/cfg/__init__.py).

Merge order: default.yaml < cfg=<custom.yaml> < kwargs, with type checking
and did-you-mean errors on unknown keys (reference get_cfg:268,
check_dict_alignment:448).
"""

from __future__ import annotations

import difflib
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, Optional, Union

import yaml

CFG_ROOT = Path(__file__).parent
DEFAULT_CFG_PATH = CFG_ROOT / "default.yaml"

CFG_FLOAT_KEYS = {"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time", "pose", "kobj", "iou_ratio"}
CFG_FRACTION_KEYS = {
    "dropout",
    "lr0",
    "lrf",
    "momentum",
    "weight_decay",
    "warmup_momentum",
    "warmup_bias_lr",
    "hsv_h",
    "hsv_s",
    "hsv_v",
    "translate",
    "scale",
    "perspective",
    "flipud",
    "fliplr",
    "bgr",
    "mosaic",
    "mixup",
    "copy_paste",
    "conf",
    "iou",
    "fraction",
}
CFG_INT_KEYS = {
    "epochs",
    "patience",
    "workers",
    "seed",
    "close_mosaic",
    "mask_ratio",
    "max_det",
    "vid_stride",
    "line_width",
    "nbs",
    "save_period",
    "max_gt",
}
CFG_BOOL_KEYS = {
    "save",
    "exist_ok",
    "verbose",
    "deterministic",
    "single_cls",
    "rect",
    "cos_lr",
    "resume",
    "amp",
    "profile",
    "multi_scale",
    "nwdloss",
    "overlap_mask",
    "val",
    "save_json",
    "save_hybrid",
    "half",
    "dnn",
    "plots",
    "show",
    "save_frames",
    "save_txt",
    "save_conf",
    "save_crop",
    "show_labels",
    "show_conf",
    "show_boxes",
    "stream_buffer",
    "visualize",
    "augment",
    "agnostic_nms",
    "retina_masks",
    "keras",
    "optimize",
    "int8",
    "dynamic",
    "simplify",
    "nms",
}


def _load_yaml(path) -> Dict[str, Any]:
    return yaml.safe_load(Path(path).read_text()) or {}


DEFAULT_CFG_DICT: Dict[str, Any] = _load_yaml(DEFAULT_CFG_PATH)
for _k, _v in DEFAULT_CFG_DICT.items():
    if isinstance(_v, str) and _v.lower() == "none":
        DEFAULT_CFG_DICT[_k] = None
DEFAULT_CFG = SimpleNamespace(**DEFAULT_CFG_DICT)


def cfg2dict(cfg: Union[str, Path, Dict, SimpleNamespace]) -> Dict[str, Any]:
    if isinstance(cfg, (str, Path)):
        return _load_yaml(cfg)
    if isinstance(cfg, SimpleNamespace):
        return vars(cfg)
    return dict(cfg)


def check_dict_alignment(base: Dict, custom: Dict):
    """Unknown-key errors with did-you-mean suggestions (reference cfg:448)."""
    mismatched = [k for k in custom if k not in base]
    if mismatched:
        msgs = []
        for k in mismatched:
            matches = difflib.get_close_matches(k, base.keys(), n=3, cutoff=0.5)
            hint = f" Did you mean {', '.join(repr(m) for m in matches)}?" if matches else ""
            msgs.append(f"'{k}' is not a valid key.{hint}")
        raise SyntaxError("\n".join(msgs))


def _check_types(cfg: Dict[str, Any]):
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS | CFG_FRACTION_KEYS and isinstance(v, (int, float)):
            cfg[k] = float(v)
        elif k in CFG_INT_KEYS and isinstance(v, (int, float)) and not isinstance(v, bool):
            cfg[k] = int(v)
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            if isinstance(v, str) and v.lower() in ("true", "false"):
                cfg[k] = v.lower() == "true"
            else:
                raise TypeError(f"'{k}={v}' must be a bool")
        elif k == "remat" and not isinstance(v, bool):
            # fail at config time, not deep inside the first training trace
            # (engine/train_step.py remat_policy accepts the same vocabulary)
            valid = {"", "0", "1", "false", "true", "off", "none", "full", "seg", "light"}
            if not (isinstance(v, str) and v.lower() in valid):
                matches = difflib.get_close_matches(str(v).lower(), sorted(valid - {""}), n=2)
                hint = f" Did you mean {', '.join(repr(m) for m in matches)}?" if matches else ""
                raise SyntaxError(
                    f"'remat={v}' is not valid: expected bool, 'full', 'seg', or 'light'.{hint}"
                )
    return cfg


def get_cfg(
    cfg: Union[str, Path, Dict, SimpleNamespace] = DEFAULT_CFG_DICT,
    overrides: Optional[Dict[str, Any]] = None,
) -> SimpleNamespace:
    """Merge config sources into a namespace (reference cfg/__init__.py:268)."""
    cfg = cfg2dict(cfg)
    merged = {**DEFAULT_CFG_DICT, **cfg}
    if overrides:
        overrides = cfg2dict(overrides)
        if "cfg" in overrides and overrides["cfg"]:
            merged.update(_load_yaml(overrides.pop("cfg")))
        check_dict_alignment(merged, overrides)
        merged.update(overrides)
    for k in ("project", "name"):
        if merged.get(k) is not None:
            merged[k] = str(merged[k])
    _check_types(merged)
    return SimpleNamespace(**merged)


def model_yaml_path(name: str) -> Path:
    """Resolve a model YAML by name against the bundled cfg/models tree."""
    p = Path(name)
    if p.exists():
        return p
    import re as _re

    names = [p.name]
    # scale-suffixed names: yolov10n.yaml / yolov8s-world.yaml also match
    # their unified file (the loader re-applies the scale from the filename)
    m = _re.match(r"(.*yolov?\d+)([nslmx])(.*)$", p.stem)
    if m:
        names.append(m.group(1) + m.group(3) + p.suffix)
    for cand in sorted(CFG_ROOT.glob("models/**/*.yaml")):
        if cand.name == names[0]:
            return cand
    if len(names) > 1:
        for cand in sorted(CFG_ROOT.glob("models/**/*.yaml")):
            if cand.name == names[1]:
                # keep the scale-suffixed name so the loader infers the scale
                return cand.with_name(p.name)
    return CFG_ROOT / "models" / "11" / p.name
