"""Plugin protocol + signal handler — ports of the reference's plugin
wiring (lib/polipus/plugin.rb, plugins/{sleeper,cleaner,sample}.rb,
lib/polipus.rb:156,173,182,201,218,250,264) and
spec/polipus/signal_handler_spec.rb:5-15."""

import os
import signal

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polipus_spark import plugin as plugin_mod
from polipus_spark.config import CrawlOptions
from polipus_spark.plans.crawler import PolipusCrawler
from polipus_spark.plugin import Cleaner, Sample, Sleeper, register
from polipus_spark.signal_handler import SignalHandler
from polipus_spark.simulator import CrawlSimulator
from polipus_spark.sources.corpus import corpus_df, gen_corpus

SEEDS = ["http://host0.example.com/"]


@pytest.fixture(autouse=True)
def clean_registry():
    plugin_mod.registry.clear()
    yield
    plugin_mod.registry.clear()


def test_registry_register_replaces_by_class_name():
    a = register(Sleeper, delay=2)
    b = register(Sleeper, delay=5)  # plugin.rb: keyed by class name
    assert plugin_mod.registry.plugins() == {"Sleeper": b}
    assert a is not b and b.delay == 5


class Recorder:
    """Test plugin: records every hook invocation + payload type."""

    def __init__(self):
        self.calls = []
        self.signal_enabled_seen = None

    def on_initialize(self, crawler):
        self.calls.append("on_initialize")

    def on_crawl_start(self, crawler):
        self.calls.append("on_crawl_start")

    def on_message_received(self, crawler, df):
        self.calls.append("on_message_received")
        self.signal_enabled_seen = SignalHandler.enabled
        assert isinstance(df, DataFrame)

    def on_before_download(self, crawler, df):
        self.calls.append("on_before_download")

    def on_after_download(self, crawler, df):
        self.calls.append("on_after_download")

    def on_message_processed(self, crawler, metrics):
        self.calls.append("on_message_processed")
        assert isinstance(metrics, dict) and "scheduled" in metrics

    def on_crawl_end(self, crawler):
        self.calls.append("on_crawl_end")


def test_all_hook_points_fire_in_order(spark, work_dir):
    rec = register(Recorder)
    docs = gen_corpus(n_hosts=2, max_docs_per_host=4, with_redirect_chain=False)
    opts = CrawlOptions(depth_limit=1, max_waves=5)
    c = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    c.takeover(SEEDS)
    assert rec.calls[0] == "on_initialize"
    assert rec.calls[1] == "on_crawl_start"
    per_wave = ["on_message_received", "on_before_download",
                "on_after_download", "on_message_processed"]
    n_waves = rec.calls.count("on_message_received")
    assert n_waves >= 2
    # hooks fire once per wave in the reference's message order; the final
    # empty wave only reaches on_message_received
    assert rec.calls[2:2 + 4 * n_waves - 3] == (per_wave * n_waves)[:4 * n_waves - 3]
    assert rec.calls[-1] == "on_crawl_end"
    # signal handler active inside the crawl loop (spec: enabled by default)
    assert rec.signal_enabled_seen is True
    assert SignalHandler.enabled is False  # restored after takeover


def test_signal_handler_disabled_if_specified(spark, work_dir):
    rec = register(Recorder)
    docs = gen_corpus(n_hosts=2, max_docs_per_host=4, with_redirect_chain=False)
    opts = CrawlOptions(depth_limit=0, max_waves=2, enable_signal_handler=False)
    c = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    c.takeover(SEEDS)
    assert rec.signal_enabled_seen is False


class BeforeDownloadFilter:
    """Dataflow-rewriting hook: drop /login URLs right before the fetch."""

    def on_before_download(self, crawler, df):
        return df.where(~F.col("url").contains("/login"))


def test_before_download_can_rewrite_the_wave(spark, work_dir):
    register(BeforeDownloadFilter)
    docs = gen_corpus(n_hosts=2, max_docs_per_host=6, with_redirect_chain=False)
    opts = CrawlOptions(depth_limit=2, max_waves=10)
    c = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    c.takeover(SEEDS)
    assert not any("/login" in u for u in c.crawl_order())
    assert len(c.crawl_order()) > 1


class ColumnDroppingPlugin:
    """Violates the replacement contract: drops an internal column."""

    def on_before_download(self, crawler, df):
        return df.drop("uuid")


def test_frame_replacement_must_preserve_columns(spark, work_dir):
    """r2 ADVICE: a hook replacement that drops wave columns must fail
    LOUDLY (PluginContractError), not silently end the session — the wave
    loop's ValueError handling means a plain ValueError would be eaten as
    'frontier never seeded'."""
    from polipus_spark.plugin import PluginContractError

    register(ColumnDroppingPlugin)
    docs = gen_corpus(n_hosts=2, max_docs_per_host=4, with_redirect_chain=False)
    opts = CrawlOptions(depth_limit=1, max_waves=3)
    c = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    with pytest.raises(PluginContractError, match="uuid"):
        c.takeover(SEEDS)


def test_sleeper_forces_per_host_budget(spark, work_dir):
    register(Sleeper, delay=30)  # 60s wave / 30s delay = 2 fetches/host/wave
    docs = gen_corpus(n_hosts=2, max_docs_per_host=6, with_redirect_chain=False)
    opts = CrawlOptions(depth_limit=2, max_waves=30)
    c = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    assert c.opts.per_host_budget == 2  # applied at on_initialize
    c.takeover(SEEDS)
    # parity with the oracle under the same forced budget
    sim = CrawlSimulator(docs, CrawlOptions(depth_limit=2, max_waves=30,
                                            per_host_budget=2))
    sim.takeover(SEEDS)
    assert c.crawl_order() == sim.crawl_order
    assert max(r["scheduled"] for r in c.metrics.read().collect()) <= 2 * 2


def test_cleaner_reset_wipes_state(spark, work_dir):
    docs = gen_corpus(n_hosts=2, max_docs_per_host=4, with_redirect_chain=False)
    opts = CrawlOptions(depth_limit=1, max_waves=5)
    c1 = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    c1.takeover(SEEDS)
    assert c1.pages_df().count() > 0

    register(Cleaner, reset=True)
    c2 = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    assert not c2.pages.exists()           # storage cleared
    assert not c2.frontier.table.exists()  # queue cleared
    assert c2.seen_set() == set()          # tracker cleared
    c2.takeover(SEEDS)                     # fresh crawl works
    assert c2.pages_df().count() == c1.pages_df().count()


def test_cleaner_disabled_keeps_state(spark, work_dir):
    docs = gen_corpus(n_hosts=2, max_docs_per_host=4, with_redirect_chain=False)
    opts = CrawlOptions(depth_limit=1, max_waves=5)
    c1 = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    c1.takeover(SEEDS)
    n = c1.pages_df().count()

    register(Cleaner)  # reset defaults to False (cleaner.rb:10-13)
    c2 = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    assert c2.pages_df().count() == n


def test_sample_plugin_logs_options(spark, work_dir):
    s = register(Sample)
    docs = gen_corpus(n_hosts=2, max_docs_per_host=4, with_redirect_chain=False)
    PolipusCrawler(spark, corpus_df(spark, docs),
                   CrawlOptions(max_waves=1), work_dir)
    assert any(line.startswith("depth_limit =>") for line in s.logged)


class SigintOnWave:
    """Sends SIGINT to this process during the second wave's processing —
    the graceful-stop contract says that wave still finishes and commits."""

    def __init__(self):
        self.fired = False

    def on_message_received(self, crawler, df):
        if not self.fired and df is not None:
            # fire on wave 1 (second wave)
            if crawler.metrics.exists() and crawler.metrics.read().count() == 1:
                self.fired = True
                os.kill(os.getpid(), signal.SIGINT)


def test_sigint_mid_crawl_stops_at_wave_boundary_and_resumes(spark, work_dir):
    """signal_handler.rb:14-36 behavior: INT mid-crawl finishes the
    in-flight wave, commits it, exits; a resume completes the crawl with
    exact parity to the uninterrupted oracle."""
    sig = register(SigintOnWave)
    docs = gen_corpus(n_hosts=3, max_docs_per_host=6, with_redirect_chain=False)
    opts = CrawlOptions(depth_limit=2, max_waves=20)
    c1 = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    c1.takeover(SEEDS)
    assert sig.fired
    committed = [r["wave"] for r in c1.metrics.read().collect()]
    assert sorted(committed) == [0, 1]  # wave 1 finished + committed, then stop
    assert SignalHandler.enabled is False  # handlers restored

    plugin_mod.registry.clear()
    sim = CrawlSimulator(docs, opts)
    sim.takeover(SEEDS)
    c2 = PolipusCrawler(spark, corpus_df(spark, docs), opts, work_dir)
    c2.takeover(resume=True)
    assert c2.crawl_order() == sim.crawl_order
    assert c2.seen_set() == sim.seen
