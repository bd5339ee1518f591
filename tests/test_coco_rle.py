"""Self-contained COCO RLE codec + segment/pose save_json (VERDICT r2 #7).

The encoder must be byte-compatible with pycocotools.mask.encode (maskApi.c);
when pycocotools is importable the parity test runs, otherwise round-trip +
hand-derived goldens pin the format.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from bsyolo_tpu.utils.coco import (
    decode_rle,
    encode_rle,
    pose_pred_to_json,
    rle_iou,
    seg_pred_to_json,
)


class TestRleCodec:
    @pytest.mark.parametrize("shape", [(1, 1), (7, 3), (13, 29), (64, 64)])
    def test_round_trip_random(self, shape, rng):
        mask = (rng.uniform(size=shape) > 0.5).astype(np.uint8)
        rle = encode_rle(mask)
        assert rle["size"] == [shape[0], shape[1]]
        np.testing.assert_array_equal(decode_rle(rle), mask)

    def test_round_trip_extremes(self):
        for mask in (np.zeros((5, 4), np.uint8), np.ones((5, 4), np.uint8)):
            np.testing.assert_array_equal(decode_rle(encode_rle(mask)), mask)

    def test_golden_all_zero(self):
        # counts=[6]: x=6 -> chars: c=6&0x1f=6, x>>=5 -> 0, stop -> chr(6+48)='6'
        assert encode_rle(np.zeros((3, 2), np.uint8))["counts"] == "6"

    def test_golden_all_one(self):
        # counts=[0, 6]: 0 -> '0'; 6 -> '6'
        assert encode_rle(np.ones((3, 2), np.uint8))["counts"] == "06"

    def test_golden_column_major(self):
        # mask [[1,0],[0,0]] flattens column-major to [1,0,0,0]:
        # counts=[0,1,3] -> '0', '1', '3'
        m = np.array([[1, 0], [0, 0]], np.uint8)
        assert encode_rle(m)["counts"] == "013"
        np.testing.assert_array_equal(decode_rle(encode_rle(m)), m)

    def test_golden_delta_coding(self):
        # alternating columns: pixels F-order [1,1,0,0,1,1] -> counts [0,2,2,2]
        # i=3: x = 2 - counts[1] = 0 -> '0'; string "0220"
        m = np.array([[1, 0, 1], [1, 0, 1]], np.uint8)
        assert encode_rle(m)["counts"] == "0220"
        np.testing.assert_array_equal(decode_rle(encode_rle(m)), m)

    def test_negative_delta_coding(self):
        # deltas can go negative (run shrinks); round-trip is the contract
        m = np.zeros((8, 8), np.uint8)
        m[:6, 0] = 1
        m[2:3, 1] = 1
        rle = encode_rle(m)
        np.testing.assert_array_equal(decode_rle(rle), m)

    def test_pycocotools_parity_if_available(self, rng):
        pycocomask = pytest.importorskip("pycocotools.mask")
        for _ in range(5):
            m = (rng.uniform(size=(23, 17)) > 0.4).astype(np.uint8)
            ours = encode_rle(m)
            ref = pycocomask.encode(np.asfortranarray(m))
            assert ours["counts"] == ref["counts"].decode("ascii")

    def test_rle_iou(self):
        a = np.zeros((4, 4), np.uint8)
        b = np.zeros((4, 4), np.uint8)
        a[:2] = 1
        b[1:3] = 1
        assert rle_iou(encode_rle(a), encode_rle(b)) == pytest.approx(4 / 12)


class TestPredToJson:
    def test_seg_records_carry_rle(self, tmp_path):
        dets = np.array([[1, 2, 10, 12, 0.9, 0], [0, 0, 5, 5, 0.0, -1]])
        masks = np.zeros((2, 20, 30), np.uint8)
        masks[0, 2:12, 1:10] = 1
        recs = seg_pred_to_json(dets, masks, "000000000042.jpg")
        assert len(recs) == 1  # conf==0 rows dropped
        assert recs[0]["image_id"] == 42
        rle = recs[0]["segmentation"]
        assert rle["size"] == [20, 30]
        np.testing.assert_array_equal(decode_rle(rle), masks[0])
        json.dumps(recs)  # json-serializable

    def test_pose_records_carry_keypoints(self):
        dets = np.array([[1, 2, 10, 12, 0.8, 0]])
        kpts = np.array([[[3.0, 4.0, 0.9], [5.0, 6.0, 0.1]]])
        recs = pose_pred_to_json(dets, kpts, "7.jpg")
        assert recs[0]["keypoints"] == [3.0, 4.0, 0.9, 5.0, 6.0, 0.1]

    def test_pose_2d_keypoints_get_visibility(self):
        dets = np.array([[1, 2, 10, 12, 0.8, 0]])
        kpts = np.array([[[3.0, 4.0], [5.0, 6.0]]])
        recs = pose_pred_to_json(dets, kpts, "7.jpg")
        assert recs[0]["keypoints"] == [3.0, 4.0, 2.0, 5.0, 6.0, 2.0]


class TestSegValSaveJson:
    def test_segment_val_writes_predictions_json(self, tmp_path, rng):
        """End-to-end: SegmentationValidator(save_json=True) writes a
        predictions.json whose RLE masks decode at original image size
        (reference models/yolo/segment/val.py pred_to_json)."""
        import cv2

        from bsyolo_tpu.data import DataLoader, YOLODataset
        from bsyolo_tpu.engine.validator import SegmentationValidator
        from bsyolo_tpu.nn import build_model, load_model_yaml, parse_model_yaml

        size = 96
        img_dir = tmp_path / "ds" / "images" / "val"
        lbl_dir = tmp_path / "ds" / "labels" / "val"
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(2):
            # non-square originals so the letterbox un-mapping is exercised
            img = rng.integers(30, 70, (64, size, 3)).astype(np.uint8)
            img[20:50, 30:70] = [225, 215, 205]
            cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), img)
            (lbl_dir / f"{i:04d}.txt").write_text(
                "0 0.3125 0.3 0.7292 0.3 0.7292 0.76 0.3125 0.76\n"
            )

        d = load_model_yaml(str(Path(__file__).parent / "fixtures" / "tinyseg.yaml"))
        spec = parse_model_yaml(d, task="segment")
        model, variables = build_model(spec, img_size=size)
        ds = YOLODataset(str(img_dir), imgsz=size, augment=False, max_gt=8, task="segment")
        loader = DataLoader(ds, 2, shuffle=False, drop_last=False)
        v = SegmentationValidator(
            model, spec, conf=1e-8, save_json=True, save_dir=str(tmp_path / "out")
        )
        v(variables, loader)
        out = tmp_path / "out" / "predictions.json"
        assert out.exists()
        recs = json.loads(out.read_text())
        assert recs, "untrained model at conf 1e-8 must emit detections"
        for r in recs:
            assert set(r) >= {"image_id", "category_id", "bbox", "score", "segmentation"}
            mask = decode_rle(r["segmentation"])
            assert mask.shape == (64, size)  # original size, not letterboxed


def test_obb_pred_to_json_roundtrip():
    """OBB save_json records (reference obb/val.py:114-129): rbox carries
    cx,cy,w,h,r; poly the 4 corners; zero-conf padding rows dropped."""
    import numpy as np

    from bsyolo_tpu.utils.coco import obb_pred_to_json

    dets = np.array([
        [50.0, 40.0, 20.0, 10.0, 0.9, 2.0, 0.0],       # axis-aligned
        [30.0, 30.0, 10.0, 10.0, 0.5, 0.0, np.pi / 2],  # rotated 90deg
        [0.0, 0.0, 0.0, 0.0, 0.0, -1.0, 0.0],           # padding row
    ])
    out = obb_pred_to_json(dets, "0007.jpg")
    assert len(out) == 2
    e = out[0]
    assert e["image_id"] == 7 and e["category_id"] == 2
    assert e["rbox"] == [50.0, 40.0, 20.0, 10.0, 0.0]
    # axis-aligned corners of a 20x10 box centered at (50, 40)
    xs = e["poly"][0::2]
    ys = e["poly"][1::2]
    assert sorted(set(xs)) == [40.0, 60.0] and sorted(set(ys)) == [35.0, 45.0]
    # class_map remap
    out2 = obb_pred_to_json(dets, "0007.jpg", class_map=[10, 11, 12])
    assert out2[0]["category_id"] == 12
