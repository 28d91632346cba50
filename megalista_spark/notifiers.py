"""Run-level error notification (reference error/error_handling.py:63-185).

The reference wires a GmailNotifier that emails destination owners when a
branch records errors, and the process exits non-zero if any ERROR was
logged (main.py:106-121). Here:

- ``ErrorNotifier`` protocol, called once at end of run with the failed
  branches;
- ``LoggingErrorNotifier`` (default) logs a structured summary;
- ``GmailErrorNotifier`` mirrors the reference's shape — the SMTP/OAuth
  send is injectable (google client libs not present in this env).

Exit semantics stay on RunResult.exit_code: any branch error → 1.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Protocol

logger = logging.getLogger("megalista_spark.errors")


class ErrorNotifier(Protocol):
    def notify(self, failed_branches: list[Any]) -> None: ...


class LoggingErrorNotifier:
    def notify(self, failed_branches: list[Any]) -> None:
        for b in failed_branches:
            logger.error(
                "destination %s (source %s) recorded %d error(s): %s",
                b.execution.destination.name,
                b.execution.source.name,
                len(b.errors),
                b.errors[:3],
            )


class GmailErrorNotifier:
    """Shape-parity with the reference's GmailNotifier: one message per
    run summarizing failed destinations, sent to the configured address.
    ``send`` is injectable; without it this raises at notify time."""

    def __init__(self, to_email: str, send: Callable[[str, str], None] | None = None):
        self.to_email = to_email
        self._send = send

    def notify(self, failed_branches: list[Any]) -> None:
        if not failed_branches:
            return
        lines = [
            f"- {b.execution.destination.name} (source {b.execution.source.name}): "
            f"{len(b.errors)} error(s); first: {b.errors[0] if b.errors else ''}"
            for b in failed_branches
        ]
        body = "Megalista run recorded errors:\n" + "\n".join(lines)
        if self._send is None:
            raise RuntimeError(
                "no mail transport configured; pass send=callable(to, body)"
            )
        self._send(self.to_email, body)
