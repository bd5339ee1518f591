"""Interactive parking-region annotation (reference solutions/parking_management.py:14-158).

The reference's ParkingPtsSelection is a tkinter app: upload an image, click
four corners per parking slot, undo the last box, save the regions to
``bounding_boxes.json`` scaled back to original-image coordinates. The rebuild
splits that into:

- :class:`RegionSelectionCore` — the full selection state machine (point
  accumulation, box completion, undo, canvas→image scaling, JSON schema),
  pure Python, headless-testable (tests/test_solutions.py drives it without a
  display);
- :class:`ParkingPtsSelection` — the tkinter shell that forwards clicks to
  the core and redraws from its state. Import-gated so headless hosts get an
  actionable error instead of a Tcl crash.

The emitted JSON is byte-compatible with what :class:`~bsyolo_tpu.solutions.
parking.ParkingManagement` consumes: ``[{"points": [[x, y] * 4]}, ...]``.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

Point = Tuple[int, int]


class RegionSelectionCore:
    """Selection state machine behind the parking-points UI.

    Canvas coordinates go in (clicks), image coordinates come out (JSON):
    the core tracks the displayed canvas size vs the original image size and
    rescales on save, exactly like the reference's save_to_json
    (parking_management.py:147-157).
    """

    POINTS_PER_REGION = 4

    def __init__(self, canvas_max: Tuple[int, int] = (1280, 720)):
        self.canvas_max = canvas_max
        self.image_size: Optional[Tuple[int, int]] = None  # (w, h) original
        self.canvas_size: Optional[Tuple[int, int]] = None  # (w, h) displayed
        self.regions: List[List[Point]] = []
        self.pending: List[Point] = []

    def load_image(self, width: int, height: int) -> Tuple[int, int]:
        """Register an image and compute the aspect-preserving canvas size
        (reference upload_image, parking_management.py:102-109). Resets any
        in-progress selection. Returns the (w, h) the canvas should take."""
        if width <= 0 or height <= 0:
            raise ValueError(f"invalid image size {width}x{height}")
        self.image_size = (width, height)
        max_w, max_h = self.canvas_max
        aspect = width / height
        if aspect > 1:
            cw = min(max_w, width)
            ch = int(cw / aspect)
        else:
            ch = min(max_h, height)
            cw = int(ch * aspect)
        self.canvas_size = (max(1, cw), max(1, ch))
        self.regions.clear()
        self.pending.clear()
        return self.canvas_size

    def add_point(self, x: int, y: int) -> bool:
        """Record one canvas click; returns True when it completes a region
        (reference on_canvas_click, :118-125)."""
        if self.canvas_size is None:
            raise RuntimeError("load_image first")
        self.pending.append((int(x), int(y)))
        if len(self.pending) == self.POINTS_PER_REGION:
            self.regions.append(self.pending.copy())
            self.pending.clear()
            return True
        return False

    def remove_last(self) -> bool:
        """Drop the most recent complete region; False if none exist
        (reference remove_last_bounding_box, :132-138)."""
        if not self.regions:
            return False
        self.regions.pop()
        return True

    def to_image_coords(self) -> List[List[Point]]:
        """Regions rescaled from canvas to original-image pixels."""
        if self.image_size is None or self.canvas_size is None:
            raise RuntimeError("load_image first")
        sw = self.image_size[0] / self.canvas_size[0]
        sh = self.image_size[1] / self.canvas_size[1]
        return [[(int(x * sw), int(y * sh)) for x, y in box] for box in self.regions]

    def to_json(self) -> str:
        """Reference JSON schema: [{"points": [[x, y], ...]}, ...]."""
        data = [{"points": [list(p) for p in box]} for box in self.to_image_coords()]
        return json.dumps(data, indent=4)

    def save(self, path: str = "bounding_boxes.json") -> str:
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_json())
        return path


class ParkingPtsSelection:
    """Tkinter front-end over :class:`RegionSelectionCore`.

    Same surface as the reference (parking_management.py:14): an Upload
    Image / Remove Last BBox / Save button row over a click-to-annotate
    canvas. Pass ``image`` to skip the file dialog and ``auto_run=False``
    to build without entering ``mainloop`` (used by the display-gated test).
    """

    def __init__(self, image: Optional[str] = None, auto_run: bool = True):
        try:
            import tkinter as tk
            from tkinter import filedialog, messagebox
        except ImportError as e:  # pragma: no cover - tkinter baked into image
            raise ImportError(
                "ParkingPtsSelection needs tkinter; on headless hosts build the "
                "regions JSON with bsyolo_tpu.solutions.parking.save_regions_json "
                "or drive RegionSelectionCore directly"
            ) from e
        if not os.environ.get("DISPLAY") and os.name == "posix":
            raise RuntimeError(
                "no $DISPLAY: tkinter needs a display server; on headless hosts "
                "drive RegionSelectionCore / save_regions_json instead"
            )
        self.tk, self.filedialog, self.messagebox = tk, filedialog, messagebox
        self.core = RegionSelectionCore()
        self.master = tk.Tk()
        self.master.title("BS-YOLO parking zones selector")
        self.master.resizable(False, False)
        self.canvas = tk.Canvas(self.master, bg="white")
        self.canvas.pack(side=tk.BOTTOM)
        self._photo = None  # keep a ref or tkinter garbage-collects the image
        bar = tk.Frame(self.master)
        bar.pack(side=tk.TOP)
        for text, cmd in (
            ("Upload Image", self.upload_image),
            ("Remove Last BBox", self.remove_last),
            ("Save", self.save),
        ):
            tk.Button(bar, text=text, command=cmd).pack(side=tk.LEFT)
        if image:
            self._show_image(image)
        if auto_run:
            self.master.mainloop()

    # -- UI handlers ------------------------------------------------------
    def upload_image(self):
        path = self.filedialog.askopenfilename(
            filetypes=[("Image Files", "*.png *.jpg *.jpeg")]
        )
        if path:
            self._show_image(path)

    def _show_image(self, path: str):
        from PIL import Image, ImageTk

        img = Image.open(path)
        cw, ch = self.core.load_image(*img.size)
        self.canvas.config(width=cw, height=ch)
        self._photo = ImageTk.PhotoImage(img.resize((cw, ch)))
        self.canvas.create_image(0, 0, anchor=self.tk.NW, image=self._photo)
        self.canvas.bind("<Button-1>", self.on_click)

    def on_click(self, event):
        self.canvas.create_oval(
            event.x - 3, event.y - 3, event.x + 3, event.y + 3, fill="red"
        )
        if self.core.add_point(event.x, event.y):
            self._draw_box(self.core.regions[-1])

    def _draw_box(self, box):
        for i in range(4):
            self.canvas.create_line(box[i], box[(i + 1) % 4], fill="blue", width=2)

    def remove_last(self):
        if not self.core.remove_last():
            self.messagebox.showwarning("Warning", "No bounding boxes to remove.")
            return
        self._redraw()

    def _redraw(self):
        self.canvas.delete("all")
        if self._photo is not None:
            self.canvas.create_image(0, 0, anchor=self.tk.NW, image=self._photo)
        for box in self.core.regions:
            self._draw_box(box)

    def save(self):
        path = self.core.save("bounding_boxes.json")
        self.messagebox.showinfo("Success", f"Bounding boxes saved to {path}")
