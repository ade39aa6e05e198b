"""SMTP transport for pipeline notifications.

Reference: core/.../notify/Sendable.scala — a javax.mail sender configured
from flat ``mail.smtp.*`` properties plus ``mail.send.from`` /
``mail.send.to`` / ``mail.send.failures.to`` / ``mail.allowed.domains``
(core/.../config/Keys.scala:30-33).  Failure to send must never fail the
pipeline: the reference logs the body and moves on; so do we.
"""

from __future__ import annotations

import logging
import smtplib
from dataclasses import dataclass, field
from email.mime.application import MIMEApplication
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

log = logging.getLogger(__name__)


@dataclass
class AttachedFile:
    """api/.../notification/NotificationEntry.AttachedFile equivalent."""

    file_name: str
    contents: bytes


@dataclass
class EmailConfig:
    """Flat ``mail.*`` configuration (Keys.scala:30-33 + Sendable.scala).

    ``smtp_options`` carries every ``mail.smtp.*`` key verbatim (host, port,
    starttls.enable, auth user/password, timeouts ...), mirroring how the
    reference copies the subtree into javax.mail properties."""

    smtp_options: Dict[str, str] = field(default_factory=dict)
    send_from: str = ""
    send_to: str = ""
    failures_to: str = ""  # used instead of send_to when the pipeline failed
    allowed_domains: Optional[List[str]] = None

    @property
    def host(self) -> str:
        return str(self.smtp_options.get("host", ""))

    @property
    def port(self) -> int:
        return int(self.smtp_options.get("port", 25))

    @classmethod
    def from_flat(cls, mail: Dict[str, Any]) -> "EmailConfig":
        """Build from a flattened ``mail.*`` dict (keys without the ``mail.``
        prefix, e.g. ``smtp.host``, ``send.to``)."""
        smtp = {
            k[len("smtp."):]: str(v) for k, v in mail.items() if k.startswith("smtp.")
        }
        domains = mail.get("allowed.domains")
        if isinstance(domains, str):
            domains = [d.strip() for d in domains.split(",") if d.strip()]
        return cls(
            smtp_options=smtp,
            send_from=str(mail.get("send.from", "") or ""),
            send_to=str(mail.get("send.to", "") or ""),
            failures_to=str(mail.get("send.failures.to", "") or ""),
            allowed_domains=list(domains) if domains else None,
        )

    def recipients(self, pipeline_failed: bool = False) -> List[str]:
        """Comma/semicolon-separated list, filtered by allowed domains
        (Keys.MAIL_ALLOWED_DOMAINS semantics: strip recipients outside the
        allowlist and warn)."""
        raw = self.failures_to if (pipeline_failed and self.failures_to) else self.send_to
        out = []
        for addr in raw.replace(";", ",").split(","):
            addr = addr.strip()
            if not addr:
                continue
            if self.allowed_domains is not None:
                domain = addr.rsplit("@", 1)[-1].lower()
                if domain not in [d.lower().lstrip("@") for d in self.allowed_domains]:
                    log.warning("Recipient %s is outside mail.allowed.domains; dropped", addr)
                    continue
            out.append(addr)
        return out


class EmailSender:
    """Builds a multipart MIME message (HTML body + attachments) and sends it
    over SMTP.  ``smtp_factory`` is injectable for tests; the default opens
    ``smtplib.SMTP`` (with STARTTLS / auth when configured)."""

    def __init__(
        self,
        config: EmailConfig,
        smtp_factory: Optional[Callable[[str, int], Any]] = None,
    ):
        self.config = config
        self._smtp_factory = smtp_factory or (
            lambda host, port: smtplib.SMTP(host, port, timeout=300)
        )

    def build_message(
        self,
        subject: str,
        body_html: str,
        recipients: Sequence[str],
        files: Sequence[AttachedFile] = (),
    ) -> MIMEMultipart:
        msg = MIMEMultipart()
        msg["From"] = self.config.send_from
        msg["To"] = ", ".join(recipients)
        msg["Subject"] = subject
        msg.attach(MIMEText(body_html, "html", "utf-8"))
        for f in files:
            part = MIMEApplication(f.contents, Name=f.file_name)
            part["Content-Disposition"] = f'attachment; filename="{f.file_name}"'
            msg.attach(part)
        return msg

    def send(
        self,
        subject: str,
        body_html: str,
        pipeline_failed: bool = False,
        files: Sequence[AttachedFile] = (),
    ) -> bool:
        """Send the report; returns True when handed to the SMTP server.
        Missing host/recipients or a transport error logs and returns False
        (never raises — Sendable.scala logs the body on failure)."""
        recipients = self.config.recipients(pipeline_failed)
        if not self.config.host or not recipients:
            log.info(
                "Email not sent: %s. The notification body follows.\n%s",
                "no mail.smtp.host configured" if not self.config.host else "no recipients",
                body_html,
            )
            return False
        msg = self.build_message(subject, body_html, recipients, files)
        try:
            server = self._smtp_factory(self.config.host, self.config.port)
            try:
                if str(self.config.smtp_options.get("starttls.enable", "")).lower() == "true":
                    server.starttls()
                user = self.config.smtp_options.get("auth.user")
                password = self.config.smtp_options.get("auth.password")
                if user and password:
                    server.login(user, password)
                server.sendmail(self.config.send_from, list(recipients), msg.as_string())
            finally:
                server.quit()
            log.info("Notification email sent to %s", recipients)
            return True
        except Exception:
            log.exception("Failed to send the notification email; body follows.\n%s", body_html)
            return False
