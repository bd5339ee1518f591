"""Port reference dataset configs to bsyolo_tpu/cfg/datasets/.

Dataset YAMLs are configuration DATA — split layout, class-id -> name maps,
keypoint shapes — that must match the reference byte-for-byte in meaning for
a user's labels to load identically. This script extracts those facts from
each reference config (reference ultralytics/cfg/datasets/*.yaml) and
re-emits them in this repo's format: the reference's inline bash/python
`download:` scripts are replaced by the source URL as a comment (this
framework is offline; utils/checks raises with guidance on download verbs).

Usage: python examples/port_dataset_configs.py
"""

import sys
from pathlib import Path

import yaml

REF = Path("/root/reference/ultralytics/cfg/datasets")
OUT = Path(__file__).resolve().parents[1] / "bsyolo_tpu/cfg/datasets"


def port(src: Path) -> str:
    d = yaml.safe_load(src.read_text())
    lines = [
        f"# {src.stem} dataset config (schema-compatible port of reference "
        f"cfg/datasets/{src.name}).",
        "# Class metadata and split layout are dataset facts and match the "
        "reference exactly.",
    ]
    if d.get("download"):
        first = str(d["download"]).strip().splitlines()[0][:100]
        lines.append("# The reference embeds a download script; this framework is "
                     "offline — fetch the")
        lines.append(f"# dataset yourself (script starts: {first!r}).")
    lines.append("")
    out = {}
    for k in ("path", "train", "val", "test"):
        if k in d:
            out[k] = d[k]
    for k in ("kpt_shape", "flip_idx"):
        if k in d:
            out[k] = d[k]
    names = d.get("names")
    if isinstance(names, list):
        names = {i: n for i, n in enumerate(names)}
    out["names"] = names
    body = yaml.safe_dump(out, sort_keys=False, allow_unicode=True, width=100)
    return "\n".join(lines) + "\n" + body


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    ported = []
    for src in sorted(REF.glob("*.yaml")):
        dst = OUT / src.name
        if dst.exists() and src.name == "car.yaml":
            continue  # hand-written port already present
        dst.write_text(port(src))
        ported.append(src.name)
    print(f"ported {len(ported)} dataset configs: {ported}")


if __name__ == "__main__":
    main()
