"""Status/notification side-channel — CKAN progress callbacks and failure
email payloads.

Ports the intent of the reference's fire-and-forget status surface
(/root/reference/aircan/dependencies/utils/ckan.py:13-79 status updates;
dependencies/utils/email.py:12-117 failure emails) without the hard
dependency on a live CKAN/SMTP: transports are injected callables so the
pipeline can report progress anywhere (HTTP, log, queue). No Spark
involvement — pure driver-side, same as the reference.
"""

from __future__ import annotations

import datetime as dt
import json
import logging
from collections.abc import Callable
from typing import Any

logger = logging.getLogger("aircan_spark.callbacks")

# lifecycle states, mirroring the reference's status vocabulary
PENDING = "pending"
RUNNING = "running"
COMPLETE = "complete"
ERROR = "error"


class StatusReporter:
    """Accumulates pipeline state transitions and pushes them through an
    injected transport. ``transport(payload_dict)`` may POST to a CKAN
    aircan_status endpoint, log, or no-op; failures are swallowed
    (fire-and-forget, like the reference)."""

    def __init__(
        self,
        resource_id: str,
        transport: Callable[[dict[str, Any]], None] | None = None,
    ):
        self.resource_id = resource_id
        self.transport = transport
        self.history: list[dict[str, Any]] = []

    def update(self, state: str, message: str = "", **extra: Any) -> dict[str, Any]:
        payload = {
            "resource_id": self.resource_id,
            "state": state,
            "message": message,
            "last_updated": dt.datetime.now(dt.timezone.utc).isoformat(),
            **extra,
        }
        self.history.append(payload)
        if self.transport is not None:
            try:
                self.transport(payload)
            except Exception:  # fire-and-forget by design
                logger.warning("status transport failed", exc_info=True)
        return payload


def build_failure_email(
    resource_id: str,
    error: str,
    site_url: str = "",
    job_id: str = "",
) -> dict[str, str]:
    """Failure-notification payload (subject + HTML body), shaped like the
    reference's alert mail but with generic redaction instead of hard-coded
    internal-name scrubbing (reference quirk deliberately not replicated,
    SURVEY §7.5)."""
    redacted = redact(error)
    subject = f"[aircan_spark] ingestion failed for resource {resource_id}"
    body = (
        "<html><body>"
        f"<h3>Resource ingestion failed</h3>"
        f"<p><b>Resource:</b> {resource_id}</p>"
        + (f"<p><b>Site:</b> {site_url}</p>" if site_url else "")
        + (f"<p><b>Job:</b> {job_id}</p>" if job_id else "")
        + f"<pre>{redacted}</pre>"
        "</body></html>"
    )
    return {"subject": subject, "html": body}


_REDACT_PATTERNS = ("gs://", "s3://", "s3a://", "postgresql://", "jdbc:")


def redact(message: str) -> str:
    """Generic secret/location redaction: URI-like tokens with credentials
    or bucket paths are collapsed to their scheme."""
    out_tokens = []
    for token in message.split():
        if any(token.startswith(p) or ("@" in token and "://" in token) for p in _REDACT_PATTERNS):
            scheme = token.split("://", 1)[0]
            out_tokens.append(f"{scheme}://<redacted>")
        else:
            out_tokens.append(token)
    return " ".join(out_tokens)


def log_transport(payload: dict[str, Any]) -> None:
    """Default transport: structured log line."""
    logger.info("status %s", json.dumps(payload, default=str))
