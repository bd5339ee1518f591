"""Photometric suite, classify transforms, DOTA splitter, auto-annotator."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


class TestPhotometric:
    def setup_method(self):
        self.img = np.random.default_rng(0).integers(0, 255, (64, 48, 3), np.uint8)

    def test_ops_preserve_shape_dtype(self):
        from bsyolo_tpu.data import photometric as P

        for fn in (lambda i: P.blur(i, 5), lambda i: P.median_blur(i, 5), P.to_gray,
                   P.clahe, lambda i: P.brightness_contrast(i, 0.1, 0.2),
                   lambda i: P.gamma(i, 1.4), lambda i: P.jpeg_compression(i, 80)):
            out = fn(self.img)
            assert out.shape == self.img.shape and out.dtype == np.uint8

    def test_gray_has_equal_channels(self):
        from bsyolo_tpu.data.photometric import to_gray

        g = to_gray(self.img)
        assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()

    def test_suite_deterministic(self):
        from bsyolo_tpu.data.photometric import photometric_suite

        a = photometric_suite(self.img, np.random.default_rng(7))
        b = photometric_suite(self.img, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)

    def test_classify_eval_center_crop(self):
        from bsyolo_tpu.data.photometric import classify_eval_transform

        out = classify_eval_transform(self.img, size=32)
        assert out.shape == (32, 32, 3) and out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_classify_train_shape_and_determinism(self):
        from bsyolo_tpu.data.photometric import classify_train_transform

        a = classify_train_transform(self.img, np.random.default_rng(3), size=32)
        b = classify_train_transform(self.img, np.random.default_rng(3), size=32)
        assert a.shape == (32, 32, 3)
        np.testing.assert_array_equal(a, b)


class TestDotaSplit:
    def test_windows_cover_image(self):
        from bsyolo_tpu.data.split_dota import get_windows

        win = get_windows((1500, 2200), crop_sizes=(1024,), gaps=(200,))
        assert (win[:, 2] - win[:, 0] == 1024).all()
        # windows must cover every image pixel
        assert win[:, 0].min() == 0 and win[:, 1].min() == 0
        assert win[:, 2].max() >= 2200 - 1 and win[:, 3].max() >= 1500 - 1

    def test_iof_exact_for_inside_poly(self):
        from bsyolo_tpu.data.split_dota import bbox_iof

        poly = np.asarray([[10, 10, 30, 10, 30, 30, 10, 30]], np.float32)
        boxes = np.asarray([[0, 0, 40, 40], [0, 0, 20, 40], [100, 100, 140, 140]], np.float32)
        iof = bbox_iof(poly, boxes)
        np.testing.assert_allclose(iof[0], [1.0, 0.5, 0.0], atol=1e-6)

    def test_split_image_shifts_labels(self):
        from bsyolo_tpu.data.split_dota import split_image

        img = np.zeros((900, 900, 3), np.uint8)
        # polygon centered at (800, 800) — belongs to the last window
        label = np.asarray([[0, 780, 780, 820, 780, 820, 820, 780, 820]], np.float32)
        crops = split_image(img, label, crop_sizes=(512,), gaps=(128,), allow_background=False)
        assert len(crops) >= 1
        crop, lb, (x0, y0) = crops[-1]
        assert crop.shape[:2] == (512, 512)
        assert len(lb) == 1
        # shifted into window coords
        assert 0 <= lb[0, 1] <= 512 and 0 <= lb[0, 2] <= 512

    def test_directory_driver(self, tmp_path):
        import cv2

        from bsyolo_tpu.data.split_dota import split_images_and_labels

        (tmp_path / "images/train").mkdir(parents=True)
        (tmp_path / "labels/train").mkdir(parents=True)
        img = np.random.default_rng(0).integers(0, 255, (700, 700, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "images/train/a.jpg"), img)
        (tmp_path / "labels/train/a.txt").write_text("1 100 100 200 100 200 200 100 200\n")
        n = split_images_and_labels(str(tmp_path), str(tmp_path / "out"), "train",
                                    crop_sizes=(512,), gaps=(128,))
        assert n >= 4
        lbls = list((tmp_path / "out/labels/train").glob("*.txt"))
        assert any(l.read_text().strip() for l in lbls)


class TestAnnotator:
    def test_auto_annotate_with_injected_models(self, tmp_path):
        """Drive auto_annotate with stub det/sam models (no heavyweight build)."""
        import cv2

        from bsyolo_tpu.data.annotator import auto_annotate
        from bsyolo_tpu.engine.results import Results

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        img = np.zeros((80, 80, 3), np.uint8)
        img[20:60, 20:60] = 200
        cv2.imwrite(str(img_dir / "a.jpg"), img)

        class StubDet:
            def predict(self, imgs, **kw):
                im = imgs[0]
                boxes = np.asarray([[20, 20, 60, 60, 0.9, 0]], np.float32)
                return [Results(im, "", {0: "obj"}, boxes=boxes)]

        class StubSAM:
            def __call__(self, im, bboxes=None):
                m = np.zeros((1, im.shape[0], im.shape[1]), np.float32)
                x1, y1, x2, y2 = map(int, bboxes[0])
                m[0, y1:y2, x1:x2] = 1
                return [Results(im, "", {0: "obj"}, masks=m)]

        n = auto_annotate(str(img_dir), det=StubDet(), sam=StubSAM(),
                          output_dir=str(tmp_path / "out"))
        assert n == 1
        txt = (tmp_path / "out" / "a.txt").read_text().strip()
        assert txt.startswith("0 ")
        vals = [float(v) for v in txt.split()[1:]]
        assert len(vals) >= 6 and all(0 <= v <= 1 for v in vals)


class TestGradCAM:
    def test_gradcam_produces_heatmap(self):
        import jax.numpy as jnp

        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
        from bsyolo_tpu.utils.visualize import grad_cam

        d = load_model_yaml("tests/fixtures/tiny.yaml")
        spec = parse_model_yaml(d)
        model, variables = build_model(spec, img_size=96)
        img = np.random.default_rng(0).integers(0, 255, (80, 96, 3), np.uint8)
        cam, overlay = grad_cam(
            model, variables, img, layer=6, conf_thres=0.0,
            strides=spec.head_strides, nc=spec.nc, imgsz=96,
        )
        assert cam.ndim == 2 and 0.0 <= cam.min() and cam.max() <= 1.0
        assert overlay.shape == img.shape and overlay.dtype == np.uint8
        assert cam.max() > 0  # some gradient actually flowed


class TestCocoJson:
    def test_roundtrip_and_eval(self, tmp_path):
        from bsyolo_tpu.utils.coco import (
            COCO80_TO_COCO91, evaluate_json, pred_to_json, save_predictions_json,
        )

        assert len(COCO80_TO_COCO91) == 80 and COCO80_TO_COCO91[0] == 1

        dets = np.asarray(
            [[10, 10, 50, 50, 0.9, 0], [60, 60, 100, 100, 0.8, 1], [0, 0, 5, 5, 0.0, 0]]
        )
        j = pred_to_json(dets, "000000000123.jpg")
        assert len(j) == 2  # zero-conf row dropped
        assert j[0]["image_id"] == 123 and j[0]["bbox"] == [10, 10, 40, 40]

        # perfect predictions -> mAP 1.0; one spurious box lowers precision
        anno = {
            "annotations": [
                {"image_id": 123, "category_id": 0, "bbox": [10, 10, 40, 40]},
                {"image_id": 123, "category_id": 1, "bbox": [60, 60, 40, 40]},
            ]
        }
        (tmp_path / "anno.json").write_text(__import__("json").dumps(anno))
        save_predictions_json(j, tmp_path / "pred.json")
        m = evaluate_json(tmp_path / "anno.json", tmp_path / "pred.json", verbose=False)
        assert m["mAP50"] > 0.99 and m["mAP50-95"] > 0.99  # 101-pt interp caps at 0.995

        # shift one prediction by 5px: IoU 0.62 -> counts at 0.5 but not 0.95
        j2 = pred_to_json(
            np.asarray([[10, 10, 50, 50, 0.9, 0], [65, 65, 105, 105, 0.8, 1]]),
            "000000000123.jpg",
        )
        save_predictions_json(j2, tmp_path / "pred2.json")
        m2 = evaluate_json(tmp_path / "anno.json", tmp_path / "pred2.json", verbose=False)
        assert m2["mAP50"] > 0.99
        assert m2["mAP50-95"] < m["mAP50-95"]


class TestChecksAndSettings:
    def test_check_imgsz(self):
        from bsyolo_tpu.utils.checks import check_imgsz

        assert check_imgsz(640) == 640
        assert check_imgsz(630) == 640
        assert check_imgsz([630, 315]) == [640, 320]
        with pytest.raises(ValueError):
            check_imgsz([1, 2, 3], max_dim=2)

    def test_check_version(self):
        from bsyolo_tpu.utils.checks import check_version

        assert check_version("2.1.0", ">=2.0")
        assert not check_version("1.9.0", ">=2.0")
        assert check_version("2.1.0", ">=2.0,<3.0")
        assert check_version("numpy", ">=1.0")
        with pytest.raises(AssertionError):
            check_version("1.0.0", ">=9.9", hard=True)

    def test_check_yaml_resolves_bundled(self):
        from bsyolo_tpu.utils.checks import check_yaml

        p = check_yaml("yolo11.yaml")
        assert p.endswith("yolo11.yaml")

    def test_path_safety(self):
        from bsyolo_tpu.utils.checks import check_is_path_safe

        assert check_is_path_safe("/tmp", "/tmp/a/b")
        assert not check_is_path_safe("/tmp/a", "/tmp/a/../../etc")

    def test_settings_roundtrip(self, tmp_path):
        from bsyolo_tpu.utils.settings import SettingsManager

        f = tmp_path / "settings.json"
        s = SettingsManager(file=str(f))
        assert f.exists() and s["tensorboard"] is True
        s["runs_dir"] = str(tmp_path / "runs")
        s2 = SettingsManager(file=str(f))
        assert s2["runs_dir"] == str(tmp_path / "runs")
        s2.reset()
        s3 = SettingsManager(file=str(f))
        assert s3["runs_dir"] != str(tmp_path / "runs")


class TestValidatorSaveJson:
    def test_predictions_json_written(self, tmp_path):
        import cv2

        from bsyolo_tpu.data.build import DataLoader
        from bsyolo_tpu.data.dataset import YOLODataset
        from bsyolo_tpu.engine.validator import DetectionValidator
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

        # 3-image dataset with numeric stems (COCO image-id convention)
        (tmp_path / "images/val").mkdir(parents=True)
        (tmp_path / "labels/val").mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(3):
            # NON-square original (128x96): exercises the un-letterboxing
            img = rng.integers(0, 255, (96, 128, 3), np.uint8)
            cv2.imwrite(str(tmp_path / f"images/val/{i:012d}.jpg"), img)
            (tmp_path / f"labels/val/{i:012d}.txt").write_text("0 0.5 0.5 0.4 0.4\n")

        d = load_model_yaml("tests/fixtures/tiny.yaml")
        spec = parse_model_yaml(d)
        model, variables = build_model(spec, img_size=64)
        ds = YOLODataset(str(tmp_path / "images/val"), imgsz=64, augment=False, max_gt=8)
        loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
        v = DetectionValidator(model, spec, conf=0.0001, save_json=True,
                               save_dir=str(tmp_path))
        v(variables, loader, verbose=False)
        import json

        rows = json.loads((tmp_path / "predictions.json").read_text())
        ids = {r["image_id"] for r in rows}
        assert ids <= {0, 1, 2} and len(rows) > 0
        assert all(len(r["bbox"]) == 4 and "score" in r for r in rows)
        # boxes must be in ORIGINAL 128x96 pixel space (un-letterboxed)
        for r in rows:
            x, y, w, bh = r["bbox"]
            assert 0 <= x <= 128 and 0 <= y <= 96
            assert x + w <= 128 + 1e-6 and y + bh <= 96 + 1e-6


class TestImageCache:
    """cache: ram|disk decoded-image cache (reference base.py cache_images)."""

    def test_ram_and_disk_match_plain(self, tmp_path):
        import shutil

        cv2 = pytest.importorskip("cv2")  # noqa: F841
        from bsyolo_tpu.data import YOLODataset

        src = Path("tests/fixtures/bsyolo8")
        if not src.exists():
            pytest.skip("bsyolo8 fixture absent")
        shutil.copytree(src, tmp_path / "d")
        root = str(tmp_path / "d" / "images" / "train")
        plain = YOLODataset(root, imgsz=320, augment=True, max_gt=32)
        ram = YOLODataset(root, imgsz=320, augment=True, max_gt=32, cache="ram")
        disk = YOLODataset(root, imgsz=320, augment=True, max_gt=32, cache="disk")
        for i in range(len(plain.img_files)):
            a = plain.get_sample(i, np.random.default_rng(i))
            b = ram.get_sample(i, np.random.default_rng(i))
            c = disk.get_sample(i, np.random.default_rng(i))
            for k in a:
                assert np.array_equal(a[k], b[k]), ("ram", i, k)
                assert np.array_equal(a[k], c[k]), ("disk", i, k)
        # disk cache materialized .npy siblings and re-reads them
        assert list(Path(root).glob("*.npy"))
        d2 = plain.get_sample(0, np.random.default_rng(0))
        e2 = disk.get_sample(0, np.random.default_rng(0))
        for k in d2:
            assert np.array_equal(d2[k], e2[k])
        # no leftover tmp files from the atomic-rename publish
        assert not list(Path(root).glob("*.tmp.npy"))
        # the cache key is imgsz-specific: a run at a different imgsz must
        # decode fresh full-res images, not reuse stale 320px bytes
        disk640 = YOLODataset(root, imgsz=640, augment=True, max_gt=32, cache="disk")
        im = disk640.load_image(0)
        assert max(im.shape[:2]) > 320
        # a corrupt/partial cache file degrades to a fresh decode
        victim = sorted(Path(root).glob("*.320.npy"))[0]
        victim.write_bytes(b"\x93NUMPY garbage")
        im = disk.load_image(disk.img_files.index(str(victim).replace(".320.npy", ".jpg")))
        assert im is not None and im.ndim == 3

    def test_cache_true_means_ram(self, tmp_path):
        from bsyolo_tpu.data import YOLODataset

        src = Path("tests/fixtures/bsyolo8")
        if not src.exists():
            pytest.skip("bsyolo8 fixture absent")
        ds = YOLODataset(str(src / "images" / "train"), imgsz=160, augment=False, cache=True)
        assert ds._ims is not None and len(ds._ims) == len(ds.img_files)


class TestBundledDatasetConfigs:
    """The reference's 31 dataset configs ship here too (cfg/datasets)."""

    def test_all_reference_dataset_configs_present_and_parse(self):
        import yaml

        ref = sorted(p.name for p in Path("/root/reference/ultralytics/cfg/datasets").glob("*.yaml"))
        ours = Path("bsyolo_tpu/cfg/datasets")
        for name in ref:
            f = ours / name
            assert f.exists(), f"missing bundled dataset config {name}"
            d = yaml.safe_load(f.read_text())
            assert isinstance(d["names"], dict) and d["names"], name
            rd = yaml.safe_load((Path("/root/reference/ultralytics/cfg/datasets") / name).read_text())
            rnames = rd["names"]
            if isinstance(rnames, list):
                rnames = {i: n for i, n in enumerate(rnames)}
            assert d["names"] == rnames, f"{name}: class map drift"
            if "kpt_shape" in rd:
                assert list(d["kpt_shape"]) == list(rd["kpt_shape"]), name

    def test_bare_name_resolves_against_bundled_tree(self):
        from bsyolo_tpu.data import load_dataset_yaml

        d = load_dataset_yaml("coco8.yaml")
        assert len(d["names"]) == 80
        assert "datasets" in str(d["path"])  # resolved via datasets_dir setting


class TestAutosplitAndCAMs:
    def test_autosplit(self, tmp_path):
        from bsyolo_tpu.data.converter import autosplit

        imgs = tmp_path / "images" / "train"
        imgs.mkdir(parents=True)
        lbls = tmp_path / "labels" / "train"
        lbls.mkdir(parents=True)
        for i in range(20):
            (imgs / f"{i}.jpg").write_bytes(b"x")
            if i % 2 == 0:
                (lbls / f"{i}.txt").write_text("0 .5 .5 .1 .1")
        c = autosplit(tmp_path / "images", (0.8, 0.2, 0.0))
        assert sum(c) == 20 and c[2] == 0
        lines = (tmp_path / "autosplit_train.txt").read_text().splitlines()
        assert lines and all(l.startswith("./train/") or l.startswith("./") for l in lines)
        # annotated_only keeps only labeled images, and is deterministic
        c2 = autosplit(tmp_path / "images", (0.5, 0.5, 0.0), annotated_only=True)
        c3 = autosplit(tmp_path / "images", (0.5, 0.5, 0.0), annotated_only=True)
        assert sum(c2) == 10 and c2 == c3

    @pytest.mark.parametrize("method", ["gradcampp", "eigencam"])
    def test_cam_variants(self, method):
        import jax.numpy as jnp  # noqa: F401

        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml
        from bsyolo_tpu.utils.visualize import grad_cam

        d = load_model_yaml("tests/fixtures/tiny.yaml")
        spec = parse_model_yaml(d)
        model, variables = build_model(spec, img_size=96)
        img = np.random.default_rng(0).integers(0, 255, (80, 96, 3), np.uint8)
        cam, overlay = grad_cam(
            model, variables, img, layer=6, conf_thres=0.0,
            strides=spec.head_strides, nc=spec.nc, imgsz=96, method=method,
        )
        assert cam.ndim == 2 and 0.0 <= cam.min() and cam.max() <= 1.0
        assert overlay.shape == img.shape


class TestListSplitsAndObbSummary:
    def test_voc_style_list_splits_resolve_and_load(self, tmp_path):
        """Dataset yaml with list-valued train (VOC.yaml convention)."""
        import shutil

        import yaml

        from bsyolo_tpu.data import YOLODataset, load_dataset_yaml

        src = Path("tests/fixtures/bsyolo8")
        if not src.exists():
            pytest.skip("bsyolo8 fixture absent")
        shutil.copytree(src / "images" / "train", tmp_path / "images" / "a")
        shutil.copytree(src / "images" / "train", tmp_path / "images" / "b")
        shutil.copytree(src / "labels" / "train", tmp_path / "labels" / "a")
        shutil.copytree(src / "labels" / "train", tmp_path / "labels" / "b")
        cfgp = tmp_path / "d.yaml"
        cfgp.write_text(yaml.safe_dump({
            "path": ".", "train": ["images/a", "images/b"],
            "names": {0: "x", 1: "y"},
        }))
        d = load_dataset_yaml(cfgp)
        assert isinstance(d["train"], list) and len(d["train"]) == 2
        ds = YOLODataset(d["train"], imgsz=64, augment=False, max_gt=8)
        assert len(ds) == 16  # both dirs listed

    def test_bundled_voc_resolves(self, tmp_path, monkeypatch):
        monkeypatch.setenv("HOME", str(tmp_path))  # SettingsManager writes there
        from bsyolo_tpu.data import load_dataset_yaml

        d = load_dataset_yaml("VOC.yaml")  # list-valued splits must not crash
        assert isinstance(d["train"], list)
        assert all(str(tmp_path) in str(x) for x in d["train"])

    def test_obb_summary(self):
        from bsyolo_tpu.engine.results import Results

        img = np.zeros((100, 100, 3), np.uint8)
        obb = np.asarray([[50, 50, 20, 10, 0.9, 0, 0.3]], np.float32)
        r = Results(img, "x.jpg", {0: "plane"}, obb=obb)
        s = r.summary()
        assert s and s[0]["name"] == "plane" and s[0]["confidence"] == 0.9
        assert s[0]["box"]["angle"] == 0.3

    def test_autosplit_nested_images_dirname(self, tmp_path):
        """'images' appearing earlier in the path must not break label lookup."""
        from bsyolo_tpu.data.converter import autosplit

        root = tmp_path / "product_images"
        (root / "images" / "train").mkdir(parents=True)
        (root / "labels" / "train").mkdir(parents=True)
        for i in range(4):
            (root / "images" / "train" / f"{i}.jpg").write_bytes(b"x")
            (root / "labels" / "train" / f"{i}.txt").write_text("0 .5 .5 .1 .1")
        c = autosplit(root / "images", (1.0, 0.0, 0.0), annotated_only=True)
        assert sum(c) == 4


class TestConvertGrounding:
    def _make_grounding(self, tmp_path):
        """Tiny Flickr30k-layout grounding json over 2 synthetic images."""
        import cv2
        import json as _json

        img_dir = tmp_path / "srcimgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(2):
            cv2.imwrite(str(img_dir / f"g{i}.jpg"),
                        rng.integers(0, 255, (80, 120, 3)).astype(np.uint8))
        cap = "a red car next to a person on the road"
        images = [
            {"id": 1, "file_name": "g0.jpg", "height": 80, "width": 120, "caption": cap},
            {"id": 2, "file_name": "g1.jpg", "height": 80, "width": 120, "caption": cap},
        ]
        anns = [
            # "a red car" twice, "a person" once, one crowd (skipped)
            {"image_id": 1, "bbox": [10, 10, 40, 30], "iscrowd": 0, "tokens_positive": [[0, 9]]},
            {"image_id": 1, "bbox": [60, 20, 30, 30], "iscrowd": 0, "tokens_positive": [[18, 26]]},
            {"image_id": 2, "bbox": [5, 5, 50, 40], "iscrowd": 0, "tokens_positive": [[0, 9]]},
            {"image_id": 2, "bbox": [0, 0, 20, 20], "iscrowd": 1, "tokens_positive": [[0, 9]]},
        ]
        jf = tmp_path / "ground.json"
        jf.write_text(_json.dumps({"images": images, "annotations": anns}))
        return jf, img_dir

    def test_convert_and_load(self, tmp_path):
        """Grounding json -> YOLO labels + phrase-vocab yaml, loadable by the
        standard dataset (reference GroundingDataset, data/dataset.py:283 —
        redesigned as a static global-vocabulary conversion)."""
        from bsyolo_tpu.data import YOLODataset, load_dataset_yaml
        from bsyolo_tpu.data.converter import convert_grounding

        jf, img_dir = self._make_grounding(tmp_path)
        yaml_path = convert_grounding(str(jf), str(img_dir), str(tmp_path / "out"))
        d = load_dataset_yaml(yaml_path)
        assert d["nc"] == 2
        # frequency-ranked vocab: "a red car" (2 uses) before "a person" (1)
        assert d["names"][0] == "a red car" and d["names"][1] == "a person"
        ds = YOLODataset(d["train"], imgsz=96, augment=False, max_gt=8)
        assert len(ds.img_files) == 2
        lbl = (tmp_path / "out" / "labels" / "train" / "g0.txt").read_text().splitlines()
        assert len(lbl) == 2  # crowd ann was on image 2; g0 has car+person
        cls0, cx, cy, w, h = map(float, lbl[0].split())
        assert cls0 == 0 and abs(cx - 30 / 120) < 1e-5 and abs(h - 30 / 80) < 1e-5

    def test_vocab_cap_drops_rare(self, tmp_path):
        from bsyolo_tpu.data import load_dataset_yaml
        from bsyolo_tpu.data.converter import convert_grounding

        jf, img_dir = self._make_grounding(tmp_path)
        yaml_path = convert_grounding(str(jf), str(img_dir), str(tmp_path / "o2"), vocab_size=1)
        d = load_dataset_yaml(yaml_path)
        assert d["nc"] == 1 and d["names"][0] == "a red car"
        lbl = (tmp_path / "o2" / "labels" / "train" / "g0.txt").read_text().splitlines()
        assert len(lbl) == 1  # "a person" box dropped with the vocab cut

    def test_phrase_yaml_escaping_and_nested_paths(self, tmp_path):
        """Captions with yaml-hostile chars survive; nested file_names keep
        their sub-directory so img2label_path resolves."""
        import cv2
        import json as _json

        from bsyolo_tpu.data import YOLODataset, load_dataset_yaml
        from bsyolo_tpu.data.converter import convert_grounding

        img_dir = tmp_path / "src"
        (img_dir / "part1").mkdir(parents=True)
        cv2.imwrite(str(img_dir / "part1" / "x.jpg"),
                    np.random.default_rng(0).integers(0, 255, (60, 60, 3)).astype(np.uint8))
        cap = 'a sign that says: "stop" #now'
        images = [{"id": 1, "file_name": "part1/x.jpg", "height": 60, "width": 60, "caption": cap}]
        anns = [{"image_id": 1, "bbox": [10, 10, 30, 30], "iscrowd": 0,
                 "tokens_positive": [[0, len(cap)]]}]
        jf = tmp_path / "g.json"
        jf.write_text(_json.dumps({"images": images, "annotations": anns}))
        yaml_path = convert_grounding(str(jf), str(img_dir), str(tmp_path / "o3"))
        d = load_dataset_yaml(yaml_path)
        assert d["names"][0] == cap.lower()
        assert (tmp_path / "o3" / "labels" / "train" / "part1" / "x.txt").exists()
        ds = YOLODataset(d["train"], imgsz=64, augment=False, max_gt=4)
        assert len(ds.labels[0][0]) == 1  # the box was found via the nested label


class TestConfigKeyWirings:
    def test_copy_paste_mixup_mode(self):
        """copy_paste_mode=mixup pastes boxes from a donor image (reference
        CopyPaste._mix_transform) with the IoA gate; flip stays default."""
        from bsyolo_tpu.data.augment import copy_paste

        rng = np.random.default_rng(0)
        img = np.zeros((64, 64, 3), np.uint8)
        dimg = np.full((64, 64, 3), 200, np.uint8)
        dcls = np.asarray([3])
        dboxes = np.asarray([[8.0, 8.0, 24.0, 24.0]], np.float32)
        out, cls, boxes = copy_paste(
            img, np.zeros((0,), np.int64), np.zeros((0, 4), np.float32), rng,
            p=1.0, donor=(dimg, dcls, dboxes),
        )
        assert (out[10, 10] == 200).all() and (out[40, 40] == 0).all()
        assert list(cls) == [3] and boxes.shape == (1, 4)

    def test_crop_fraction_changes_eval_crop(self):
        from bsyolo_tpu.data.photometric import classify_eval_transform

        im = np.zeros((100, 100, 3), np.uint8)
        im[40:60, 40:60] = 255  # center patch
        full = classify_eval_transform(im, size=32, crop_fraction=1.0)
        tight = classify_eval_transform(im, size=32, crop_fraction=0.5)
        # tighter crop zooms the center patch: more bright pixels
        assert tight.mean() > full.mean()

    def test_track_default_tracker_is_cfg_botsort(self, monkeypatch):
        from bsyolo_tpu import YOLO
        from bsyolo_tpu.trackers.bot_sort import BOTSORT

        m = YOLO.__new__(YOLO)
        m.overrides = {}
        m.predict = lambda source, **kw: []
        out = m.track("x")
        assert isinstance(m._tracker, BOTSORT)


def test_tail_wrap_pads_to_full_batch_on_tiny_dataset(tmp_path):
    """A dataset smaller than (batch - tail) must still yield full static
    batches: the wrap pad repeats indices via np.resize (a single wrap came
    up short and broke fixed-shape artifact validation)."""
    import cv2

    from bsyolo_tpu.data import DataLoader, YOLODataset

    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(3):  # 3 images, batch 8: pad needs 5 > len(order)
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    np.random.default_rng(i).integers(0, 255, (48, 48, 3)).astype(np.uint8))
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    ds = YOLODataset(str(img_dir), imgsz=64, augment=False, max_gt=4)
    loader = DataLoader(ds, 8, shuffle=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["img"].shape[0] == 8
    im_idx = np.asarray(b["im_idx"])
    assert (im_idx >= 0).sum() == 3  # real rows
    assert (im_idx < 0).sum() == 5   # wrapped duplicates, excluded downstream


class TestMixedFormatOBBLabels:
    def test_plain_row_keeps_rbox_alignment(self, tmp_path):
        """A mixed OBB label file (plain 5-part box row + 9-part corner row)
        must keep the corner payload row-aligned: the plain row gets an
        axis-aligned rbox at angle 0, the corner row keeps ITS corners.
        Regression: the parser used to skip the placeholder for plain rows,
        shifting every later instance's rotated geometry by one."""
        import cv2

        from bsyolo_tpu.data.dataset import YOLODataset

        img_dir = tmp_path / "images" / "train"
        lbl_dir = tmp_path / "labels" / "train"
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        cv2.imwrite(str(img_dir / "0.jpg"), np.full((64, 64, 3), 99, np.uint8))
        # row 0: plain box centered (0.25, 0.25); row 1: 45-degree diamond
        d = 0.18  # half-diagonal of the rotated square
        corners = f"{0.7} {0.7 - d} {0.7 + d} {0.7} {0.7} {0.7 + d} {0.7 - d} {0.7}"
        (lbl_dir / "0.txt").write_text(
            "0 0.25 0.25 0.2 0.2\n" f"1 {corners}\n"
        )
        ds = YOLODataset(str(img_dir), imgsz=64, augment=False, task="obb", max_gt=4)
        s = ds.get_sample(0, np.random.default_rng(0))
        rb = s["rboxes"]
        assert s["mask"][:2].sum() == 2
        # instance 0: the plain row -> axis-aligned, angle 0
        np.testing.assert_allclose(rb[0, :2], [0.25, 0.25], atol=0.02)
        assert abs(rb[0, 4]) < 1e-6
        # instance 1: the corner row -> centered at (0.7, 0.7) with ~45 deg
        # (mod pi/2) rotation, NOT the plain row's geometry
        np.testing.assert_allclose(rb[1, :2], [0.7, 0.7], atol=0.02)
        ang = float(rb[1, 4]) % (np.pi / 2)
        assert min(ang, np.pi / 2 - ang) > 0.6, f"angle {rb[1,4]} not ~45deg"
