"""Graceful-stop signal handling.

Reference: /root/reference/lib/polipus/signal_handler.rb:14-36 — a
singleton that traps INT/TERM and flips a ``terminated`` flag the worker
loop checks after each message (lib/polipus.rb:252-256: "finish the
current message, commit, exit"). Spec: signal_handler_spec.rb:5-15
(enabled by default, disabled via ``enable_signal_handler: false``).

Wave-model analog: ``install`` traps SIGINT/SIGTERM to call
``crawler.stop()`` — the takeover loop checks ``_stop_requested`` at the
wave boundary, so the in-flight wave finishes, its metrics row commits,
and the crawl is exactly resumable. A second signal while stopping falls
through to the previous handler (default: exit) — same escape hatch as
the reference's ``exit unless enabled?``.
"""

from __future__ import annotations

import signal
from contextlib import contextmanager


class SignalHandler:
    """Module-singleton state (signal_handler.rb's ``include Singleton``)."""

    enabled: bool = False
    terminated: bool = False
    _previous: dict[int, object] = {}

    @classmethod
    def enable(cls, crawler) -> None:
        def _handler(signum, frame):
            if cls.terminated:  # second signal: escalate to prior handler
                cls.disable()
                signal.raise_signal(signum)
                return
            cls.terminated = True
            crawler.stop()

        for sig in (signal.SIGINT, signal.SIGTERM):
            cls._previous[sig] = signal.signal(sig, _handler)
        cls.enabled = True
        cls.terminated = False

    @classmethod
    def disable(cls) -> None:
        for sig, prev in cls._previous.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, TypeError):  # non-main thread / exotic prev
                pass
        cls._previous.clear()
        cls.enabled = False

    @classmethod
    def terminated_(cls) -> bool:
        return cls.terminated


@contextmanager
def handle_signals(crawler, enabled: bool = True):
    """Install INT/TERM → ``crawler.stop()`` for the duration of a crawl
    session; always restores the previous handlers. Used by
    ``PolipusCrawler.takeover`` when ``opts.enable_signal_handler``."""
    if not enabled:
        yield
        return
    try:
        SignalHandler.enable(crawler)
    except ValueError:  # signal only works in the main thread — degrade
        yield
        return
    try:
        yield
    finally:
        SignalHandler.disable()
