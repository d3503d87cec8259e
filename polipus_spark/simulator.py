"""Reference-semantics crawl simulator — the behavioral oracle.

A deliberately simple, sequential, pure-Python implementation of exactly the
semantics cited from the reference in SURVEY §2/§3 (filter branch order,
enqueue-time tracker marking, seed bypass, redirect re-checks, TTL force,
drop-oldest caps, politeness budgets, deterministic (depth, discovery_ts,
seq) total order). It stands in for Ruby Polipus run at workers=1 over the
same synthetic corpus; pytest compares the Spark engine's crawl order, final
URL-seen set, pages table, and per-wave metrics against it EXACTLY
(BASELINE.json: "identical crawl order + URL-seen set ... under fixed seed
list/politeness budget").

URL canonicalization and robots parsing reuse the same pure-Python kernels
as the Spark UDFs (functions/urls.py, functions/robots.py) — those kernels
are themselves pinned by golden cases ported from the reference's RSpec
suite (FIXTURES.md §4), so sharing them does not make the dataflow
comparison circular: what this oracle checks is the *wave dataflow*, which
is implemented twice (sequential dict/list code here, DataFrame code in
plans/crawler.py).
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass, field

from polipus_spark.config import CrawlOptions
from polipus_spark.functions.links import BASE_RE, HREF_RE
from polipus_spark.functions.robots import allowed_scalar, delay_scalar, parse_robots_text
from polipus_spark.functions.urls import _canon_one, host_of

SIM_ERROR = "connection refused (simulated)"


def h60_py(s: str) -> int:
    """Same 60-bit hash as functions.urls.h60 (first 15 md5 hex chars)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def uuid_py(url: str, include_query: bool = True) -> str:
    key = url if include_query else re.sub(r"\?.*$", "", url)
    return hashlib.md5(key.encode()).hexdigest()


def path_of(url: str) -> str:
    p = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "", url)
    p = re.sub(r"[?#].*$", "", p)
    return p or "/"


@dataclass
class SimPage:
    uuid: str
    url: str            # final url
    requested_url: str
    referer: str | None
    depth: int
    code: int | None
    aliases: list[str]
    redirect_to: str | None
    fetched: bool
    fetched_at: int
    error: str | None
    is_seed: bool
    wave: int
    links: list[str] = field(default_factory=list)


class CrawlSimulator:
    def __init__(self, docs: list[dict], opts: CrawlOptions,
                 clock_fn=None):
        self.corpus = {d["doc_id"]: d for d in docs}
        self.opts = opts
        self.clock_fn = clock_fn or (lambda wave: wave)
        self.frontier: list[dict] = []
        self.scheduled: set[int] = set()
        self.pages: dict[str, SimPage] = {}
        self.seen: set[str] = set()
        self.crawl_order: list[str] = []
        self.metrics: list[dict] = []
        self.next_seq = 0
        self.next_wave = 0
        self.robots: dict[str, list[dict]] = {}
        if opts.obey_robots_txt:
            for d in docs:
                if re.match(r"^https?://[^/]+/robots\.txt$", d["doc_id"]) and d["code"] == 200:
                    body = "\n".join(
                        s["text"] for s in sorted(d["spans"], key=lambda s: s["offset"])
                        if s["kind"] == "text"
                    )
                    self.robots[d["host"]] = parse_robots_text(d["host"], body)

    # ---------------------------------------------------------------- gates
    def _tracker_key(self, url: str) -> str:
        if self.opts.include_query_string_in_saved_page:
            return url
        return re.sub(r"\?.*$", "", url)

    def _policy_pass(self, url: str) -> bool:
        """F7 / F1 arms 1-3: robots → whitelist → blacklist (on path)."""
        o = self.opts
        if o.obey_robots_txt:
            host = host_of(url)
            rules = self.robots.get(host, [])
            ua = o.user_agent[0] if isinstance(o.user_agent, list) else o.user_agent
            if not allowed_scalar(url, ua, rules):
                return False
        path = path_of(url)
        if o.follow_links_like and not any(re.search(p, path) for p in o.follow_links_like):
            return False
        if any(re.search(p, path) for p in o.skip_links_like):
            return False
        return True

    def _expired(self, uuid: str, now: int) -> bool:
        if self.opts.ttl_page is None:
            return False
        page = self.pages.get(uuid)
        if page is None or page.fetched_at is None:
            return False
        return (now - self.opts.ttl_page) > page.fetched_at

    def _page_exists(self, uuid: str, is_seed: bool, now: int) -> bool:
        if is_seed:
            return False
        return uuid in self.pages and not self._expired(uuid, now)

    # ---------------------------------------------------------------- fetch
    def _fetch(self, url: str):
        """S4+J5: corpus lookup with bounded same-host redirect following."""
        aliases: list[str] = []
        cur = url
        doc = self.corpus.get(cur)
        hops = 0
        while (
            doc is not None
            and doc["code"] is not None
            and 300 <= doc["code"] <= 399
            and doc.get("redirect_to")
            and host_of(doc["redirect_to"]) == host_of(cur)
            and hops < self.opts.redirect_limit
        ):
            aliases.append(cur)
            cur = doc["redirect_to"]
            doc = self.corpus.get(cur)
            hops += 1
        return cur, doc, aliases

    def _extract_links(self, page_url: str, spans: list[dict]) -> list[str]:
        """X2/F9/F10/J9: hrefs from text spans in span order, canonicalized,
        in-domain, first-occurrence distinct."""
        ordered = sorted(spans, key=lambda s: s["offset"])
        texts = [s["text"] for s in ordered if s["kind"] == "text"]
        joined = "\n".join(texts)
        m = re.search(BASE_RE, joined)
        base = m.group(1) if m else page_url
        out: list[str] = []
        seen_local: set[str] = set()
        page_host = host_of(page_url)
        aliases = set(self.opts.domain_aliases)
        for t in texts:
            for raw in re.findall(HREF_RE, t):
                link = _canon_one(raw, base)
                if link is None or link in seen_local:
                    continue
                lh = host_of(link)
                if lh != page_host and lh not in aliases:
                    continue
                seen_local.add(link)
                out.append(link)
        return out

    # ------------------------------------------------------------------ API
    def seed(self, urls: list) -> None:
        wave = self.next_wave
        for i, u in enumerate(urls):
            url, priority = (u, 0) if isinstance(u, str) else u
            canon = _canon_one(url, None)
            self.frontier.append(
                dict(
                    url=canon, tracker_key=self._tracker_key(canon),
                    uuid=uuid_py(canon, self.opts.include_query_string_in_uuid),
                    host=host_of(canon), referer=None, depth=0,
                    priority=priority, discovery_ts=wave, seq=self.next_seq,
                    is_seed=True,
                )
            )
            self.next_seq += 1

    def _order_key(self, row: dict):
        return (row["priority"], row["depth"], row["discovery_ts"], row["seq"])

    def _budget_for(self, host: str) -> int | None:
        o = self.opts
        if o.obey_robots_txt and host in self.robots:
            ua = o.user_agent[0] if isinstance(o.user_agent, list) else o.user_agent
            d = delay_scalar(ua, self.robots[host])
            if d and d > 0:
                return max(1, math.floor(o.wave_seconds / d))
        return o.per_host_budget

    def process_wave(self) -> dict:
        o = self.opts
        wave = self.next_wave
        now = self.clock_fn(wave)
        m = {"wave": wave, "clock": now}

        pending = [r for r in self.frontier if r["seq"] not in self.scheduled]
        if o.queue_overflow_capped_max is not None:
            pending = sorted(pending, key=lambda r: -r["seq"])[: o.queue_overflow_capped_max]
        pending.sort(key=self._order_key)
        if o.queue_items_limit is not None:
            pending = pending[: o.queue_items_limit]

        # politeness pop: per host_salt rank <= per-salt budget share
        s = max(1, o.salt_factor)
        popped: list[dict] = []
        counts: dict[int, int] = {}
        for r in pending:
            budget = self._budget_for(r["host"])
            if budget is None:
                popped.append(r)
                continue
            salt = h60_py(r["host"]) * s + (h60_py(r["url"]) % s) if s > 1 else h60_py(r["host"])
            per_salt = max(1, budget // s)
            c = counts.get(salt, 0)
            if c < per_salt:
                counts[salt] = c + 1
                popped.append(r)
        for r in popped:
            self.scheduled.add(r["seq"])
        m["scheduled"] = len(popped)
        if not popped:
            m.update(fetched=0, errors=0, enqueued=0, dedup_hits=0, policy_dropped=0)
            self.metrics.append(m)
            return m

        dedup_hits = policy_dropped = fetched_n = errors = enqueued = 0
        stored_n = retried = 0
        for row in popped:  # already in oracle order
            if not self._policy_pass(row["url"]):   # F7
                policy_dropped += 1
                continue
            if self._page_exists(row["uuid"], row["is_seed"], now):  # F8
                dedup_hits += 1
                continue
            final_url, doc, aliases = self._fetch(row["url"])
            final_uuid = uuid_py(final_url, o.include_query_string_in_uuid)
            if aliases and self._page_exists(final_uuid, row["is_seed"], now):
                dedup_hits += 1  # redirect-final re-check (lib/polipus.rb:208-212)
                continue
            if doc is None:
                errors += 1
                retry_cnt = int((row.get("user_data") or {}).get("retry", "0"))
                if o.retry_limit > 0 and retry_cnt < o.retry_limit:
                    fetched_n += 1  # processed but not stored
                    # O6: not stored; re-enqueued unconditionally (add_url)
                    retried += 1
                    enqueued += 1
                    self.frontier.append(
                        dict(
                            url=row["url"], tracker_key=row["tracker_key"],
                            uuid=row["uuid"], host=row["host"],
                            referer=row["referer"], depth=row["depth"],
                            priority=row["priority"], discovery_ts=wave,
                            seq=self.next_seq, is_seed=False,
                            user_data={"retry": str(retry_cnt + 1)},
                        )
                    )
                    self.next_seq += 1
                    continue
                page = SimPage(
                    uuid=final_uuid, url=final_url, requested_url=row["url"],
                    referer=row["referer"], depth=row["depth"], code=None,
                    aliases=aliases, redirect_to=None, fetched=False,
                    fetched_at=now, error=SIM_ERROR, is_seed=row["is_seed"],
                    wave=wave,
                )
            else:
                page = SimPage(
                    uuid=final_uuid, url=final_url, requested_url=row["url"],
                    referer=row["referer"], depth=row["depth"], code=doc["code"],
                    aliases=aliases,
                    redirect_to=doc.get("redirect_to")
                    if doc["code"] and 300 <= doc["code"] <= 399 else None,
                    fetched=True, fetched_at=now, error=None,
                    is_seed=row["is_seed"], wave=wave,
                )
            self.pages[page.uuid] = page
            self.crawl_order.append(row["url"])
            fetched_n += 1
            stored_n += 1

            # link expansion (F5 depth gate)
            if doc is None or not doc["spans"]:
                continue
            if o.depth_limit is not None and row["depth"] >= o.depth_limit:
                continue
            links = self._extract_links(final_url, doc["spans"])
            page.links = links
            for pos, link in enumerate(links):
                # F1: robots → wl → bl → expired(force) → tracker
                if not self._policy_pass(link):
                    continue
                tkey = self._tracker_key(link)
                link_uuid = uuid_py(link, o.include_query_string_in_uuid)
                forced = self._expired(link_uuid, now)
                if not forced and tkey in self.seen:
                    continue
                self.frontier.append(
                    dict(
                        url=link, tracker_key=tkey, uuid=link_uuid,
                        host=host_of(link), referer=final_url,
                        depth=row["depth"] + 1, priority=0,
                        discovery_ts=wave, seq=self.next_seq, is_seed=False,
                    )
                )
                self.next_seq += 1
                self.seen.add(tkey)  # J2: enqueue-time marking (§3.2)
                enqueued += 1

        m.update(
            fetched=fetched_n, errors=errors, enqueued=enqueued,
            dedup_hits=dedup_hits, policy_dropped=policy_dropped,
            stored=stored_n, retried=retried,
        )
        self.metrics.append(m)
        return m

    def takeover(self, seeds: list | None = None) -> None:
        if seeds:
            self.seed(seeds)
        waves = 0
        while any(r["seq"] not in self.scheduled for r in self.frontier):
            if self.opts.max_waves is not None and waves >= self.opts.max_waves:
                break
            self.process_wave()
            self.next_wave += 1
            waves += 1

    def stats(self) -> dict:
        return {
            "pages": sum(m["fetched"] for m in self.metrics),
            "errors": sum(m["errors"] for m in self.metrics),
        }
