"""The YOLO model facade (maps reference engine/model.py Model + models/yolo/model.py).

Task-agnostic user entrypoint:

    from bsyolo_tpu import YOLO
    m = YOLO("yolo11n.yaml")          # build from graph config
    m = YOLO("runs/.../best.ckpt")     # load a trained checkpoint
    m = YOLO("yolo11n.yaml").load("yolo11n.pt")  # import reference weights
    m.train(data="car.yaml", epochs=200)
    m.val(data="car.yaml")
    m.predict("image.jpg", save=True)
    m.track("video.mp4")
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import numpy as np

from bsyolo_tpu.cfg import get_cfg, model_yaml_path
from bsyolo_tpu.utils import LOGGER


class YOLO:
    def __init__(self, model: Union[str, Path] = "yolo11n.yaml", task: Optional[str] = None):
        self.model_path = str(model)
        self.task = task or "detect"
        self.overrides: Dict[str, Any] = {}
        self.spec = None
        self.model = None
        self.variables = None
        self.metrics = None
        self._predictor = None
        self._img_size = 640
        p = Path(self.model_path)
        self._artifact = (
            self.model_path
            if p.suffix in (".onnx", ".stablehlo", ".tflite")
            or p.name.endswith(".stablehlo-int8")
            or (p.is_dir() and (p / "saved_model.pb").exists())
            else None
        )
        if self._artifact:
            # exported-artifact mode (reference YOLO("best.onnx")): val()
            # runs through AutoBackend; train/predict need the live graph
            pass
        elif self.model_path.endswith(".ckpt"):
            self._load_ckpt(self.model_path)
        elif self.model_path.endswith(".pt"):
            raise ValueError(
                "reference .pt checkpoints carry no loadable graph here; use "
                "YOLO('<model>.yaml').load('<weights>.pt') instead"
            )
        else:
            self._new(self.model_path)

    # --- construction -----------------------------------------------------
    def _new(self, yaml_name: str, img_size: int = 640):
        import jax.numpy as jnp

        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
        from bsyolo_tpu.utils.settings import enable_compilation_cache

        enable_compilation_cache()  # repeat processes skip the first compile
        path = model_yaml_path(yaml_name)
        d = load_model_yaml(path)
        self.spec = parse_model_yaml(d, scale=d.get("scale", ""))
        self.model, self.variables = build_model(self.spec, img_size=img_size)
        self._img_size = img_size
        self._embed_fns = {}  # jitted embed() cache follows the graph

    def _load_ckpt(self, path: str):
        from bsyolo_tpu.engine.trainer import load_checkpoint

        payload, meta = load_checkpoint(path)
        args = meta.get("args", {})
        model_yaml = args.get("model", "yolo11n.yaml")
        self._new(model_yaml)
        # prefer EMA weights like the reference (trainer.py:512 ckpts are EMA)
        self.variables = {
            "params": payload.get("ema_params", payload["params"]),
            "batch_stats": payload["batch_stats"],
        }
        self.ckpt_meta = meta
        tf = payload.get("txt_feats")
        if tf is not None:
            # world ckpt: rebind the text embeddings the model trained
            # against (without them the graph falls back to the untrained
            # placeholder text and the weights are meaningless)
            import dataclasses

            import jax.numpy as jnp

            self.txt_feats = jnp.asarray(np.asarray(tf))
            self.model = _TextConditioned(self.model, self.txt_feats)
            names = meta.get("names") or [str(i) for i in range(self.txt_feats.shape[1])]
            self.spec = dataclasses.replace(self.spec, nc=len(names), names=tuple(names))
            self.overrides["names"] = {i: n for i, n in enumerate(names)}

    def load(self, weights: str) -> "YOLO":
        """Import reference torch weights into the current graph."""
        from bsyolo_tpu.utils.torch_weights import convert_state_dict, load_torch_checkpoint

        sd, meta = load_torch_checkpoint(weights)
        self.variables, report = convert_state_dict(sd, self.variables, strict=False)
        n_missing = len(report["missing"])
        if n_missing:
            LOGGER.warning(f"weight import: {n_missing} params not found in {weights}")
        return self

    @property
    def names(self) -> Dict[int, str]:
        return {i: n for i, n in enumerate(self.spec.names)} if self.spec else {}

    @property
    def device(self):
        """The accelerator this model dispatches to (reference Model.device)."""
        import jax

        return jax.devices()[0]

    # --- modes --------------------------------------------------------------
    def train(self, **kwargs):
        from bsyolo_tpu.engine.trainer import DetectionTrainer, load_checkpoint

        overrides = {**self.overrides, **kwargs}
        overrides["model"] = overrides.get("model", self.model_path)
        if self.spec is not None and self.spec.task == "classify":
            from bsyolo_tpu.engine.classify import ClassificationTrainer

            trainer = ClassificationTrainer(
                overrides=overrides, callbacks=getattr(self, "_callbacks", None)
            )
            self.metrics = trainer.train()
            self.spec = trainer.spec
            self.model = trainer.model
            self.variables = {
                "params": trainer.state.ema_params,
                "batch_stats": trainer.state.batch_stats,
            }
            self.trainer = trainer
            self._predictor = None
            self._embed_fns = {}
            return self.metrics
        trainer = DetectionTrainer(
            overrides=overrides, callbacks=getattr(self, "_callbacks", None),
            text_embeddings=getattr(self, "_world_text_embeddings", None),
        )
        self.metrics = trainer.train()
        # adopt trained EMA weights + spec
        self.spec = trainer.spec
        self.model = trainer.model
        self.variables = {
            "params": trainer.state.ema_params,
            "batch_stats": trainer.state.batch_stats,
        }
        self._img_size = trainer.args.imgsz
        self._predictor = None
        self._embed_fns = {}
        self.trainer = trainer
        return self.metrics

    def _bf16_graph(self, imgsz: int):
        """bf16 inference graph + cast weights (predict/val half=True): one
        shared path so the two verbs can't diverge. Preserves a YOLOWorld
        _TextConditioned wrapper (set_classes embeddings survive half=True)
        and caches the cast weight tree until self.variables is replaced —
        per-call casting would re-upload the whole model every frame."""
        import jax.numpy as jnp

        from bsyolo_tpu.nn import build_model
        from bsyolo_tpu.nn.model import cast_inference_params

        cache = getattr(self, "_bf16_cache", None)
        if cache is None or cache[0] is not self.variables or cache[3] != imgsz:
            model, _ = build_model(self.spec, img_size=imgsz, dtype=jnp.bfloat16)
            cache = (self.variables, model, cast_inference_params(self.variables), imgsz)
            self._bf16_cache = cache
        model, variables = cache[1], cache[2]
        if isinstance(self.model, _TextConditioned):
            model = _TextConditioned(model, self.model.text)
        return model, variables

    def val(self, data: Optional[str] = None, batch: int = 16, imgsz: Optional[int] = None, **kwargs):
        """Validate with the task-appropriate validator (mirrors reference
        task_map dispatch, models/yolo/model.py:26): segment models get mask
        mAP, pose OKS, OBB probIoU, classify top1/top5 — not box-only metrics."""
        if getattr(self, "_artifact", None):
            # exported-artifact validation (reference `yolo val model=best.onnx`)
            from bsyolo_tpu.engine.backend import validate_artifact

            self.metrics = validate_artifact(
                self._artifact, data or self.overrides.get("data"),
                batch=batch, imgsz=imgsz, **kwargs,
            )
            return self.metrics
        assert self.model is not None, (
            "no model loaded (exported artifacts support val() only; rebuild from "
            "the .yaml/.ckpt for train/predict)"
        )
        data = data or self.overrides.get("data")
        imgsz = imgsz or self._img_size
        task = self.spec.task

        if task == "classify":
            from pathlib import Path as _P

            from bsyolo_tpu.data.classify import ClassificationDataset, ClassifyLoader
            from bsyolo_tpu.engine.classify import ClassificationValidator

            root = _P(data)
            val_dir = root / ("val" if (root / "val").exists() else "test")
            ds = ClassificationDataset(
                val_dir, imgsz=imgsz, augment=False,
                crop_fraction=float(kwargs.get("crop_fraction", 1.0) or 1.0),
            )
            loader = ClassifyLoader(ds, batch, shuffle=False, drop_last=False)
            self.metrics = ClassificationValidator(self.model)(self.variables, loader)
            return self.metrics

        from bsyolo_tpu.data import DataLoader, YOLODataset, load_dataset_yaml
        from bsyolo_tpu.engine.validator import (
            DetectionValidator,
            OBBValidator,
            PoseValidator,
            SegmentationValidator,
        )

        d = load_dataset_yaml(data)
        split = kwargs.get("split", "val")
        if not d.get(split):  # missing OR declared-but-null (test: null)
            raise KeyError(f"dataset {data} has no '{split}' split (cfg `split:`)")
        ds = YOLODataset(
            d[split],
            imgsz=imgsz,
            augment=False,
            max_gt=kwargs.get("max_gt", 128),
            single_cls=bool(kwargs.get("single_cls", False)),
            task=task,
            flip_idx=d.get("flip_idx"),
        )
        rect = bool(kwargs.get("rect", False))
        if rect and task != "detect":
            LOGGER.warning("rect val is detect-only here; using square letterbox")
            rect = False
        loader = DataLoader(ds, batch, shuffle=False, drop_last=False, rect=rect)
        validator_cls = {
            "segment": SegmentationValidator,
            "pose": PoseValidator,
            "obb": OBBValidator,
        }.get(task, DetectionValidator)
        vkw = {}
        # NMS knobs flow to the validator (reference val args conf=0.001/
        # iou=0.7/max_det=300 are overridable per call)
        for k in ("conf", "iou", "max_det"):
            if kwargs.get(k) is not None:
                vkw[k] = kwargs[k]
        if kwargs.get("single_cls"):
            # reference val single_cls: GT classes were zeroed by the dataset
            # above; every validator also collapses prediction classes (and
            # detect/seg/pose run agnostic NMS)
            vkw["single_cls"] = True
        if kwargs.get("classes"):
            vkw["classes"] = list(kwargs["classes"])
        if kwargs.get("save_txt") and validator_cls is DetectionValidator:
            # per-image normalized-xywh txts (reference save_one_txt)
            vkw["save_txt"] = True
            vkw["save_conf"] = bool(kwargs.get("save_conf", False))
            vkw.setdefault("save_dir", kwargs.get("save_dir", "runs/val"))
        if kwargs.get("plots"):
            # reference val artifacts: confusion_matrix.png (probIoU-matched
            # for OBB), PR/P/R/F1 curves; detect additionally writes
            # val_batch{i}_{labels,pred}.jpg
            vkw["plots"] = True
            vkw.setdefault("save_dir", kwargs.get("save_dir", "runs/val"))
        if kwargs.get("save_json"):
            # COCO-format predictions.json (reference val.py save_json):
            # segment adds self-contained RLE masks, pose keypoint triplets,
            # OBB rbox+poly records (reference obb/val.py pred_to_json) —
            # utils/coco.py. Official COCO ids when validating a coco dataset.
            cm = None
            if "coco" in str(data).lower() and self.spec.nc == 80:
                from bsyolo_tpu.utils.coco import COCO80_TO_COCO91

                cm = COCO80_TO_COCO91
            vkw.update({"save_json": True, "save_dir": kwargs.get("save_dir", "runs/val"),
                        "class_map": cm})
        vmodel, vvars = self.model, self.variables
        if kwargs.get("half"):
            # bf16 eval (reference val half=True), shared with predict
            vmodel, vvars = self._bf16_graph(imgsz)
        validator = validator_cls(vmodel, self.spec, names=d.get("names"), **vkw)
        self.metrics = validator(vvars, loader)
        return self.metrics

    def predict(self, source, stream: bool = False, **kwargs):
        from bsyolo_tpu.engine.predictor import DetectionPredictor

        assert self.model is not None, (
            "no model loaded (exported artifacts support val() only; rebuild from "
            "the .yaml/.ckpt for train/predict)"
        )
        conf = kwargs.get("conf")
        conf = 0.25 if conf is None else conf  # 0.0 is a valid threshold
        imgsz = kwargs.get("imgsz") or self._img_size
        batch = int(kwargs.get("batch", 1) or 1)
        augment = bool(kwargs.get("augment", False))
        half = bool(kwargs.get("half", False))
        key = (conf, kwargs.get("iou", 0.7), imgsz, tuple(kwargs.get("classes") or ()), batch,
               augment, bool(kwargs.get("stream_buffer", False)),
               bool(kwargs.get("retina_masks", False)),
               kwargs.get("max_det", 300), bool(kwargs.get("agnostic_nms", False)), half)
        if self._predictor is None or self._predictor_key != key:
            model, variables = self.model, self.variables
            if half:
                # bf16 inference (the TPU half; the path bench.py measures,
                # ~30% faster on v5e, norm stats stay f32)
                model, variables = self._bf16_graph(imgsz)
            self._predictor = DetectionPredictor(
                model,
                self.spec,
                variables,
                conf=conf,
                iou=kwargs.get("iou", 0.7),
                max_det=kwargs.get("max_det", 300),
                imgsz=imgsz,
                classes=kwargs.get("classes"),
                agnostic_nms=kwargs.get("agnostic_nms", False),
                names=self.names,
                batch=batch,
                augment=augment,
                stream_buffer=bool(kwargs.get("stream_buffer", False)),
                retina_masks=bool(kwargs.get("retina_masks", False)),
            )
            self._predictor_key = key
        elif not half:
            self._predictor.variables = self.variables
        else:
            self._predictor.variables = self._bf16_graph(imgsz)[1]  # cached cast
        gen = self._predictor.stream(
            source, vid_stride=kwargs.get("vid_stride", 1), verbose=kwargs.get("verbose", False)
        )
        if stream:
            return gen
        results = list(gen)
        if kwargs.get("save"):
            self._save_results(results, kwargs)
        if kwargs.get("save_txt") or kwargs.get("save_crop"):
            # reference predictor write_results: labels/{stem}.txt and
            # crops/{class}/{stem}.jpg alongside the annotated output
            out_dir = Path(kwargs.get("project", "runs/detect")) / kwargs.get("name", "predict")
            for i, r in enumerate(results):
                raw = str(r.path)
                if "#" in raw:
                    # video frames are 'clip.mp4#frameN' — '#frameN' lands in
                    # Path.suffix, so .stem alone would collapse EVERY frame
                    # to 'clip' and each txt/crop would overwrite the last
                    base, _, fr = raw.partition("#")
                    stem = f"{Path(base).stem}_{fr}"
                elif raw == "array":
                    stem = f"image{i}"
                else:
                    stem = Path(raw).stem
                if kwargs.get("save_txt"):
                    r.save_txt(out_dir / "labels" / f"{stem}.txt",
                               save_conf=bool(kwargs.get("save_conf", False)))
                if kwargs.get("save_crop"):
                    r.save_crop(out_dir / "crops", file_name=stem)
        if kwargs.get("show"):
            self._show_results(results, kwargs)
        if kwargs.get("visualize") and results:
            self._visualize_features(results[0], kwargs)
        return results

    def _visualize_features(self, r, kwargs):
        """predict(visualize=True): per-graph-layer feature-map grids for the
        first image (reference nn/tasks.py:159-160 feature_visualization)."""
        import jax.numpy as jnp

        from bsyolo_tpu.ops.letterbox import letterbox_image
        from bsyolo_tpu.utils.visualize import capture_features, feature_visualization

        out_dir = (Path(kwargs.get("project", "runs/detect"))
                   / kwargs.get("name", "predict") / "features")
        lb, _, _ = letterbox_image(r.orig_img, (self._img_size, self._img_size))
        x = jnp.asarray(
            np.ascontiguousarray(lb[..., ::-1])[None].astype(np.float32) / 255.0
        )
        feats = capture_features(self.model, self.variables, x)
        n = 0
        for k, v in feats.items():
            if "/" in k:  # nested submodule taps — keep top-level layers only
                continue
            feature_visualization(v, str(out_dir / f"{k}_features.png"))
            n += 1
        LOGGER.info(f"visualize: wrote {n} feature-map grids to {out_dir}")

    def _save_results(self, results, kwargs):
        """save=True output layout (reference predictor.py write_results):
        image sources -> annotated jpg; video sources -> ONE annotated mp4 at
        the source fps, plus per-frame jpgs when save_frames=True."""
        import cv2

        out_dir = Path(kwargs.get("project", "runs/detect")) / kwargs.get("name", "predict")
        plot_kw = {
            "labels": bool(kwargs.get("show_labels", True)),
            "conf": bool(kwargs.get("show_conf", True)),
            "boxes": bool(kwargs.get("show_boxes", True)),
        }
        if kwargs.get("line_width"):
            plot_kw["line_width"] = int(kwargs["line_width"])
        save_frames = bool(kwargs.get("save_frames", False))
        writers: Dict[str, Any] = {}
        try:
            for i, r in enumerate(results):
                if "#frame" in str(r.path):
                    src, _, fidx = str(r.path).partition("#frame")
                    w = writers.get(src)
                    if w is None:
                        cap = cv2.VideoCapture(src)
                        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                        cap.release()
                        out_dir.mkdir(parents=True, exist_ok=True)
                        h0, w0 = r.orig_img.shape[:2]
                        w = writers[src] = cv2.VideoWriter(
                            str(out_dir / f"{Path(src).stem}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), max(fps, 1.0), (w0, h0),
                        )
                    w.write(r.plot(**plot_kw))
                    if save_frames:
                        r.save(out_dir / f"{Path(src).stem}_{fidx}.jpg", **plot_kw)
                else:
                    stem = Path(r.path).stem if r.path not in ("array",) else f"image{i}"
                    r.save(out_dir / f"{stem}.jpg", **plot_kw)
        finally:
            for w in writers.values():
                w.release()

    def _show_results(self, results, kwargs):
        """show=True (reference predictor.py:274 show): pops cv2 windows —
        headless hosts (no DISPLAY) get one warning instead of a crash."""
        import os
        import sys

        import cv2

        # X11 needs DISPLAY; Windows and macOS (Quartz, no DISPLAY var) don't
        if not (os.environ.get("DISPLAY") or os.name == "nt" or sys.platform == "darwin"):
            LOGGER.warning("show=True: no display available, skipping imshow")
            return
        plot_kw = {
            "labels": bool(kwargs.get("show_labels", True)),
            "conf": bool(kwargs.get("show_conf", True)),
            "boxes": bool(kwargs.get("show_boxes", True)),
        }
        for r in results:
            cv2.imshow("bsyolo", r.plot(**plot_kw))
            cv2.waitKey(1)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def embed(self, source, stream: bool = False, **kwargs):
        """Pooled per-image feature embeddings (reference Model.embed,
        engine/model.py:465-497): global-average-pool the requested layers'
        activations (default: the second-to-last layer, like the reference)
        and return one 1-D vector per image (nn/tasks.py:161-164 semantics).
        """
        import jax
        import jax.numpy as jnp

        from bsyolo_tpu.engine.predictor import iter_source
        from bsyolo_tpu.ops.letterbox import letterbox_image

        assert self.model is not None, (
            "no model loaded (exported artifacts support val() only; rebuild from "
            "the .yaml/.ckpt for train/predict)"
        )
        idxs = tuple(kwargs.get("embed") or (len(self.spec.layers) - 2,))
        imgsz = kwargs.get("imgsz") or self._img_size

        # cache the jitted forward per (layers, imgsz): a fresh closure per
        # call would defeat jit's cache and recompile on every embed()
        cache = getattr(self, "_embed_fns", None)
        if cache is None:
            cache = self._embed_fns = {}
        fwd = cache.get((idxs, imgsz))
        if fwd is None:
            model = self.model

            def fwd(variables, x, _idxs=idxs):
                return model.apply(
                    variables, x.astype(jnp.float32) / 255.0, train=False, embed=_idxs
                )

            fwd = cache[(idxs, imgsz)] = jax.jit(fwd)

        def gen():
            for frame, _path, _isvid in iter_source(source, kwargs.get("vid_stride", 1)):
                lb, _, _ = letterbox_image(frame, (imgsz, imgsz))
                rgb = np.ascontiguousarray(lb[..., ::-1]) if lb.ndim == 3 else lb
                yield np.asarray(fwd(self.variables, jnp.asarray(rgb[None])))[0]

        return gen() if stream else list(gen())

    def fuse(self):
        """Reference Model.fuse folds BN into conv weights for inference
        (torch_utils.py:242). Here the BN is already a per-channel affine that
        XLA fuses into the conv epilogue at compile time (nn/modules.py:14),
        so there is nothing to do at the parameter level — kept for API parity.
        """
        return self

    def reset_weights(self) -> "YOLO":
        """Re-initialize all parameters (reference Model.reset_weights)."""
        from bsyolo_tpu.nn import build_model

        assert self.spec is not None, "no model loaded"
        self.model, self.variables = build_model(self.spec, img_size=self._img_size)
        self._predictor = None
        self._embed_fns = {}
        return self

    # --- callback bus (reference Model.add_callback/clear_callback) ---------
    def add_callback(self, event: str, fn):
        if not hasattr(self, "_callbacks") or self._callbacks is None:
            from bsyolo_tpu.utils.callbacks import default_callbacks

            self._callbacks = default_callbacks()
        self._callbacks.add(event, fn)

    def clear_callback(self, event: str):
        if getattr(self, "_callbacks", None) is not None:
            self._callbacks._cbs.pop(event, None)

    def reset_callbacks(self):
        self._callbacks = None

    def track(self, source, persist: bool = False, tracker: Optional[str] = None, **kwargs):
        """Detection + multi-object tracking (reference engine/model.py:560).

        ``tracker`` defaults to the cfg ``tracker`` key (botsort.yaml, like
        the reference default.yaml:133)."""
        from bsyolo_tpu.trackers import track_results

        if tracker is None:
            from bsyolo_tpu.cfg import DEFAULT_CFG_DICT

            tracker = self.overrides.get("tracker") or DEFAULT_CFG_DICT.get(
                "tracker", "botsort.yaml"
            )
        if not persist or not hasattr(self, "_tracker"):
            from bsyolo_tpu.trackers import create_tracker

            self._tracker = create_tracker(tracker)
        kwargs.setdefault("conf", 0.1)  # reference track defaults (model.py:602)
        results = self.predict(source, **kwargs)
        if isinstance(results, list):
            return [track_results(self._tracker, r) for r in results]
        return (track_results(self._tracker, r) for r in results)

    def save(self, path: str):
        """Save current weights as a .ckpt loadable by YOLO()."""
        from bsyolo_tpu.engine.train_step import init_train_state
        from bsyolo_tpu.engine.trainer import save_checkpoint

        state = init_train_state(self.variables)
        meta = {
            "args": {"model": self.model_path}, "epoch": -1, "fitness": 0.0,
            "names": [str(n) for n in (self.spec.names if self.spec else ())],
        }
        tf = getattr(self, "txt_feats", None)
        extras = {"txt_feats": np.asarray(tf)} if tf is not None else None
        save_checkpoint(Path(path), state, meta, extras=extras)
        return path

    def export(self, format: str = "stablehlo", **kwargs):
        from bsyolo_tpu.engine.exporter import export_model

        return export_model(self, format=format, **kwargs)

    def benchmark(self, imgsz: int = 320, out_dir: str = "runs/benchmark", data=None, batch: int = 8):
        """Export to every supported format and verify each artifact runs;
        with ``data``, mAP-validate and speed-time each runnable artifact
        (reference Model.benchmark, engine/model.py:643)."""
        from bsyolo_tpu.utils.benchmarks import benchmark

        return benchmark(self, imgsz=imgsz, out_dir=out_dir, data=data, batch=batch)

    def tune(self, iterations: int = 10, space=None, tune_dir: str = "runs/tune", **overrides):
        """Mutation-evolution hyperparameter search (reference Model.tune)."""
        from bsyolo_tpu.engine.tuner import Tuner

        overrides.setdefault("model", self.model_path)
        return Tuner(overrides, space=space, tune_dir=tune_dir)(iterations=iterations)

    def info(self):
        from bsyolo_tpu.nn.model import count_params

        n = count_params(self.variables["params"]) if self.variables else 0
        LOGGER.info(f"{self.model_path}: {len(self.spec.layers)} layers, {n:,} parameters")
        return {"layers": len(self.spec.layers), "parameters": n}


from bsyolo_tpu.nn.model import TextConditioned as _TextConditioned  # noqa: E402


class YOLOWorld(YOLO):
    """Open-vocabulary YOLO-World facade (reference models/yolo/model.py:62).

    Classes are set by text embeddings rather than a fixed head:

        m = YOLOWorld("yolov8s-world.yaml")
        m.set_classes(["person", "bus"], embeddings=E)   # E: (2, 512) array

    The reference computes E with CLIP ViT-B/32; CLIP is not bundled in this
    offline image, so pass precomputed embeddings (any (K, 512) float array,
    L2-normalized rows). Without set_classes the model runs with the
    deterministic placeholder text buffer, matching the reference's untrained
    WorldModel.txt_feats (tasks.py:608).
    """

    def __init__(self, model: Union[str, Path] = "yolov8s-world.yaml", task: Optional[str] = None):
        super().__init__(model, task or "detect")
        # a world .ckpt restores its trained text in _load_ckpt — keep it
        self.txt_feats = getattr(self, "txt_feats", None)
        if self.txt_feats is not None and hasattr(self.model, "model"):
            self.model = self.model.model  # facade invariant: raw graph here

    def train(self, text_embeddings=None, **kwargs):
        """Fine-tune the world graph on a close-set dataset (reference
        WorldTrainer, models/yolo/world/train.py): detection loss over
        contrastive class logits against the dataset's class-name text
        embeddings. ``text_embeddings``: optional (nc, 512) CLIP vectors, a
        {name: vector} dict, or a path to a saved .npz table (resolved
        against the dataset's class names, "/"-synonyms averaged);
        hashed n-gram fallback otherwise (clearly non-CLIP, offline)."""
        self._world_text_embeddings = text_embeddings
        metrics = super().train(**kwargs)
        # base train adopts trainer.model (the TextConditioned wrapper);
        # keep the facade invariant: raw graph in self.model, text in
        # self.txt_feats (predict/export re-wrap on demand)
        if isinstance(self.model, _TextConditioned):
            self.txt_feats = self.model.text
            self.model = self.model.model
        names = self.trainer.data.get("names") or {}
        self.overrides["names"] = {int(k): v for k, v in names.items()}
        return metrics

    def set_classes(self, names: List[str], embeddings=None):
        """Bind class names to text embeddings ((K, 512)).

        ``embeddings`` may be a (K, 512) array, a ``{name: vector}`` dict, or
        a path to a saved ``.npz`` embedding table (either one-array-per-name
        or a names/vectors pair — utils/text_embed.load_text_embeddings);
        names are looked up in the table with "/"-synonym averaging, so a
        user with real CLIP vectors saved once gets reference-equivalent
        open-vocab behavior offline.

        Without ``embeddings`` falls back to deterministic hashed n-gram
        vectors (utils/text_embed.py) — a NON-CLIP stand-in that exercises
        the full open-vocab path offline but carries no visual semantics;
        pass CLIP ViT-B/32 embeddings for real quality (the reference's
        encoder, models/yolo/world/train.py)."""
        import jax.numpy as jnp

        if isinstance(embeddings, (list, tuple)):
            embeddings = np.asarray(embeddings, np.float32)
        elif embeddings is not None and not hasattr(embeddings, "ndim"):
            from bsyolo_tpu.utils.text_embed import resolve_text_embeddings

            embeddings = resolve_text_embeddings(names, embeddings)
        if embeddings is None:
            from bsyolo_tpu.utils import LOGGER
            from bsyolo_tpu.utils.text_embed import hashed_text_embeddings

            LOGGER.warning(
                "set_classes called without embeddings: using deterministic "
                "hashed n-gram text vectors (NOT CLIP — lexical only; pass "
                "embeddings= for semantically meaningful open-vocab detection)"
            )
            embeddings = hashed_text_embeddings(names)
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim != 2 or emb.shape[0] != len(names):
            raise ValueError(f"embeddings must be ({len(names)}, embed); got {emb.shape}")
        emb = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        self.txt_feats = jnp.asarray(emb[None])  # (1, K, 512)
        self.overrides["names"] = {i: n for i, n in enumerate(names)}
        # rebuild the spec's class count so decode/NMS use K classes
        import dataclasses

        self.spec = dataclasses.replace(self.spec, nc=len(names), names=tuple(names))
        self._predictor = None  # force predictor rebuild with the new text

    def predict(self, source, stream: bool = False, **kwargs):
        if self.txt_feats is not None:
            real_model = self.model
            self.model = _TextConditioned(real_model, self.txt_feats)
            try:
                return super().predict(source, stream=stream, **kwargs)
            finally:
                self.model = real_model
        return super().predict(source, stream=stream, **kwargs)


class RTDETR(YOLO):
    """Baidu RT-DETR facade (reference models/rtdetr/model.py:18).

    Real-time detection transformer: HGNetv2 backbone, AIFI hybrid encoder,
    deformable-attention decoder with 300 queries — NMS-free end to end.
    Training uses the Hungarian-matched DETR loss with contrastive denoising
    (losses/detr.py); predict/val decode straight from the query outputs.

        m = RTDETR("rtdetr-l.yaml")
        m.train(data="coco8.yaml", epochs=10)
        m.predict("image.jpg")
    """

    def __init__(self, model: Union[str, Path] = "rtdetr-l.yaml", task: Optional[str] = None):
        super().__init__(model, task or "detect")
