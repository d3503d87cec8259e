"""Plugin protocol — named-hook plugins on a global registry.

Reference: /root/reference/lib/polipus/plugin.rb:5-12 (registry keyed by
class name, re-register replaces) and lib/polipus.rb:479-487
(``execute_plugin``: call ``<hook>(crawler)`` on every registered plugin
that responds to it; a returned Proc is instance_eval'd on the crawler —
here, a returned callable is invoked with the crawler, same effect).

Hook points (wired in plans/crawler.py at the positions the reference
calls them, lib/polipus.rb:156,173,182,201,218,250,264):

  * ``on_initialize(crawler)``        — end of ``__init__``
  * ``on_crawl_start(crawler)``       — start of ``takeover``
  * ``on_message_received(crawler, popped_df)``   — after pop, before the
    dequeue-time policy revalidation (per wave — the wave is the message
    batch in this engine)
  * ``on_before_download(crawler, wave_df)``      — after page_exists
    dedup, before the fetch join; may return a DataFrame to replace the
    wave (request-rewriting analog of the Ruby Proc mutation)
  * ``on_after_download(crawler, fetched_df)``    — after fetch +
    redirect resolution; may return a replacement DataFrame. Columns
    prefixed ``_`` are internal wave flags — passed through untouched.
  * ``on_message_processed(crawler, metrics_dict)`` — end of the wave
  * ``on_crawl_end(crawler)``         — end of ``takeover``

Shipped plugins mirror the reference's (plugins/sleeper.rb, cleaner.rb,
sample.rb), re-expressed for the wave model.
"""

from __future__ import annotations

from typing import Any


class PluginContractError(RuntimeError):
    """A dataflow-rewriting hook returned a frame that violates the wave
    contract (dropped internal columns). Deliberately NOT a ValueError:
    the wave loop treats ValueError as 'frontier never seeded' and would
    silently end the session instead of surfacing the broken plugin."""


class PluginRegistry:
    """Global named-plugin registry (plugin.rb:4-14 ``@@plugins``)."""

    def __init__(self) -> None:
        self._plugins: dict[str, Any] = {}

    def register(self, plugin_cls: type, **options) -> Any:
        inst = plugin_cls(**options)
        self._plugins[plugin_cls.__name__] = inst  # re-register replaces
        return inst

    def plugins(self) -> dict[str, Any]:
        return dict(self._plugins)

    def clear(self) -> None:
        self._plugins.clear()


registry = PluginRegistry()


def register(plugin_cls: type, **options) -> Any:
    """``Polipus::Plugin.register`` analog."""
    return registry.register(plugin_cls, **options)


class Sleeper:
    """Rate limiter (plugins/sleeper.rb:12-15: workers=1 + sleep(delay)
    per message ⇒ ≤ 1/delay fetches/sec).

    Wave-model analog: cap every host's per-wave budget at
    ``floor(wave_seconds / delay)`` fetches — the same sustained rate
    under the logical clock, with no real sleeping (the wave IS the time
    slice)."""

    def __init__(self, delay: float = 1):
        self.delay = delay

    def on_initialize(self, crawler):
        def apply(c):
            budget = max(1, int(c.opts.wave_seconds // self.delay))
            if c.opts.per_host_budget is None or c.opts.per_host_budget > budget:
                c.opts.per_host_budget = budget

        return apply

    def on_message_processed(self, crawler, metrics):
        # the reference sleeps here; the logical clock already advanced
        return None


class Cleaner:
    """State wipe (plugins/cleaner.rb:9-22): clears url_tracker, storage
    and queue at init — only when constructed with ``reset=True``."""

    def __init__(self, reset: bool = False):
        self.reset = reset

    def on_initialize(self, crawler):
        if not self.reset:
            return None

        def apply(c):
            c.tracker.clear()
            c.pages.truncate()
            c.fetch_log.truncate()
            c.frontier.table.truncate()
            c.frontier.scheduled.truncate()

        return apply


class Sample:
    """Config logger (plugins/sample.rb:8-12)."""

    def __init__(self):
        self.logged: list[str] = []

    def on_initialize(self, crawler):
        def apply(c):
            from dataclasses import fields

            for f in fields(c.opts):
                self.logged.append(f"{f.name} => {getattr(c.opts, f.name)}")

        return apply
