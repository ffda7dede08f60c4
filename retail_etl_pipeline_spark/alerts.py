"""Concrete S10 alert transports for the pipeline's ``on_missing`` seam.

The reference hard-wires an SES email when the readiness gate fails
(``AWS SES.py:4-57``, invoked from ``Lambda Function.py:47``): subject
``"Files missing in S3 bucket"``, plain-text body, UTF-8 charset, one
sender/recipient. This module reproduces that message contract over two
stdlib transports (SMTP and HTTP webhook) so ``run_pipeline(...,
on_missing=...)`` can alert without any cloud SDK:

* :func:`missing_files_message` — the (subject, body) pair, extended to
  enumerate the missing files (the reference's static body loses that
  information; the subject is kept verbatim for alert-routing parity).
* :func:`smtp_alert` — returns a callback that emails via ``smtplib``.
* :func:`webhook_alert` — returns a callback that POSTs JSON, mirroring
  the reference Lambda's other branch (``curl -X POST`` with a JSON
  payload, ``Lambda Function.py:26-44``).

Both factories take an injectable transport (``smtp_factory`` /
``opener``) so unit tests exercise the full message path without a
network.
"""

from __future__ import annotations

import json
import smtplib
import urllib.request
from collections.abc import Callable
from email.message import EmailMessage

#: Reference subject line, kept verbatim (``AWS SES.py:15``).
SUBJECT = "Files missing in S3 bucket"

#: Reference body preamble (``AWS SES.py:18``).
_BODY_PREAMBLE = "Files missing in AWS S3 bucket. Please check Snowflake task."


def missing_files_message(missing: list[str], location: str | None = None) -> tuple[str, str]:
    """(subject, body) for a readiness-gate failure.

    Matches the reference SES contract (``AWS SES.py:15-18``) and appends
    the concrete missing-file list, which the reference computes
    (``Lambda Function.py:20``) but never includes in the alert.
    """
    lines = [_BODY_PREAMBLE]
    if location:
        lines.append(f"Location: {location}")
    lines.append("Missing files:")
    lines.extend(f"  - {name}" for name in missing)
    return SUBJECT, "\n".join(lines)


def smtp_alert(
    sender: str,
    recipient: str,
    host: str = "localhost",
    port: int = 25,
    location: str | None = None,
    smtp_factory: Callable[[str, int], smtplib.SMTP] | None = None,
) -> Callable[[list[str]], None]:
    """Build an ``on_missing`` callback that emails the alert over SMTP.

    ``smtp_factory(host, port)`` must return an object supporting the
    ``smtplib.SMTP`` context-manager protocol with ``send_message``;
    defaults to ``smtplib.SMTP`` itself.
    """
    factory = smtp_factory or smtplib.SMTP

    def on_missing(missing: list[str]) -> None:
        subject, body = missing_files_message(missing, location)
        msg = EmailMessage()
        msg["Subject"] = subject
        msg["From"] = sender
        msg["To"] = recipient
        msg.set_content(body, charset="utf-8")  # reference CHARSET, AWS SES.py:23
        with factory(host, port) as smtp:
            smtp.send_message(msg)

    return on_missing


def webhook_alert(
    url: str,
    location: str | None = None,
    opener: Callable[..., object] | None = None,
    timeout: float = 10.0,
) -> Callable[[list[str]], None]:
    """Build an ``on_missing`` callback that POSTs a JSON alert.

    Payload mirrors the reference Lambda's HTTP-trigger shape
    (JSON body, ``Content-Type: application/json``,
    ``Lambda Function.py:26-44``) with the alert message contract:
    ``{"subject": ..., "body": ..., "missing": [...]}``.

    ``opener(request, timeout=...)`` defaults to
    ``urllib.request.urlopen``; inject a fake in tests.
    """
    open_fn = opener or urllib.request.urlopen

    def on_missing(missing: list[str]) -> None:
        subject, body = missing_files_message(missing, location)
        payload = json.dumps(
            {"subject": subject, "body": body, "missing": list(missing)}
        ).encode("utf-8")
        req = urllib.request.Request(
            url,
            data=payload,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        resp = open_fn(req, timeout=timeout)
        close = getattr(resp, "close", None)
        if close is not None:
            close()

    return on_missing
