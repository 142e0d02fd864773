"""Real-browser smoke (round-3 verdict stretch item #9).

Skipped automatically while the container has no selenium/browser; the day
either appears, the full execution path (DriverFactory pool → Visit →
WaitForDocumentReady → Snapshot → CSS select) lights up with no code changes
— the actions speak the plain WebDriver protocol, so the only difference vs
the fake-driver tests is the factory below.
"""

from __future__ import annotations

import pytest

selenium = pytest.importorskip("selenium")


def _make_driver():
    from selenium import webdriver

    last_err = None
    for opts_cls, drv_cls in (
        (webdriver.ChromeOptions, webdriver.Chrome),
        (webdriver.FirefoxOptions, webdriver.Firefox),
    ):
        try:
            opts = opts_cls()
            opts.add_argument("--headless")
            if drv_cls is webdriver.Chrome:
                opts.add_argument("--no-sandbox")
                opts.add_argument("--disable-dev-shm-usage")
            return drv_cls(options=opts)
        except Exception as e:  # noqa: BLE001 — browser/driver binary absent
            last_err = e
    pytest.skip(f"no usable browser binary: {last_err}")


def test_visit_snapshot_select_roundtrip(tmp_path):
    from spookystuff_spark.actions.core import Trace
    from spookystuff_spark.actions.runtime import fetch_trace
    from spookystuff_spark.actions.web import (
        Snapshot,
        Visit,
        WaitForDocumentReady,
        clear_driver_pool,
    )
    from spookystuff_spark.conf import SpookyConf
    from spookystuff_spark.doc.node import parse_node

    page = tmp_path / "p.html"
    page.write_text(
        "<html><head><title>Real Browser</title></head>"
        '<body><h1 id="hello">hi</h1></body></html>'
    )
    clear_driver_pool()
    try:
        conf = SpookyConf(
            cache_read=False,
            cache_write=False,
            fetch_retries=1,
            retry_delay_sec=0.0,
            webdriver_factory=_make_driver,
            webdriver_pool="transient",
        )
        obs = fetch_trace(
            Trace(
                (
                    Visit(page.as_uri()),
                    WaitForDocumentReady(timeout_sec=10.0),
                    Snapshot(),
                )
            ),
            conf,
        )
        assert len(obs) == 1 and obs[0].success
        node = parse_node(obs[0].content, obs[0].mime, obs[0].uri)
        assert node.find_first("title").text == "Real Browser"
        assert node.find_first("#hello").text == "hi"
    finally:
        clear_driver_pool()
