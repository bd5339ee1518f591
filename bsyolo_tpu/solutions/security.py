"""Security alarm: email alert when detections exceed a threshold
(reference solutions/security_alarm.py).

The SMTP server object is injectable so tests (and non-gmail deployments)
can supply their own transport; one alert per breach episode — the flag
rearms when the count drops back under the threshold (reference monitor()).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from bsyolo_tpu.solutions.solutions import BaseSolution
from bsyolo_tpu.utils import LOGGER


class SecurityAlarm(BaseSolution):
    def __init__(self, model=None, records: int = 5, **kwargs):
        super().__init__(model, **kwargs)
        self.records = records
        self.email_sent = False
        self.server = None
        self.from_email = ""
        self.to_email = ""

    def authenticate(self, from_email: str, password: str, to_email: str, server=None):
        """Log into an SMTP server (gmail by default; pass ``server`` to
        inject any smtplib-compatible transport)."""
        if server is None:
            import smtplib

            server = smtplib.SMTP("smtp.gmail.com", 587)
            server.starttls()
            server.login(from_email, password)
        self.server = server
        self.from_email = from_email
        self.to_email = to_email

    def _send_email(self, frame: np.ndarray, count: int):
        import cv2
        from email.mime.image import MIMEImage
        from email.mime.multipart import MIMEMultipart
        from email.mime.text import MIMEText

        msg = MIMEMultipart()
        msg["From"] = self.from_email
        msg["To"] = self.to_email
        msg["Subject"] = "Security Alert"
        msg.attach(MIMEText(f"ALERT: {count} objects detected!"))
        msg.attach(MIMEImage(cv2.imencode(".jpg", frame)[1].tobytes(), name="alert.jpg"))
        self.server.send_message(msg)
        LOGGER.info("security alert email sent")

    def monitor(self, frame: np.ndarray) -> int:
        """One frame -> current detection count; fires one email per breach."""
        boxes, ids, clss, confs = self.extract_tracks(frame)
        n = len(boxes)
        if n >= self.records and not self.email_sent:
            if self.server is not None:
                self._send_email(frame, n)
            else:
                LOGGER.warning("security alarm triggered but no email server configured")
            self.email_sent = True
        elif n < self.records:
            self.email_sent = False  # re-arm after the episode ends
        return n
