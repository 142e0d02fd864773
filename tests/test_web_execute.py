"""Browser-action EXECUTION tests against an injected fake webdriver —
mirrors WebInteraction.scala:17-59 / Snapshot.scala:13-32 / DriverFactory
pooling semantics without selenium: the actions speak the plain WebDriver
protocol ("css selector" find_element(s), get, page_source, execute_script),
so any conforming object drives the full path via
``SpookyConf.webdriver_factory``."""

from __future__ import annotations

import pytest

from spookystuff_spark.actions.core import Trace
from spookystuff_spark.actions.runtime import fetch_trace
from spookystuff_spark.actions.web import (
    Click,
    ClickNext,
    DragSlider,
    DropDownSelect,
    ExeScript,
    Screenshot,
    Snapshot,
    Submit,
    TextInput,
    ToFrame,
    Visit,
    WaitFor,
    WaitForDocumentReady,
    clear_driver_pool,
)
from spookystuff_spark.conf import SpookyConf


class FakeElement:
    def __init__(self, drv, sel, text="", attrs=None, children=None):
        self.drv = drv
        self.sel = sel
        self._text = text
        self.attrs = dict(attrs or {})
        self.children = children or {}
        self.value = ""
        self.size = {"width": 200, "height": 20}

    @property
    def text(self):
        return self._text

    def click(self):
        self.drv.log.append(("click", self.sel, self._text))
        self.drv.state["last_click"] = self.sel

    def submit(self):
        self.drv.log.append(("submit", self.sel))

    def send_keys(self, t):
        self.value += t
        self.drv.log.append(("send_keys", self.sel, t))

    def get_attribute(self, name):
        return self.attrs.get(name)

    def find_element(self, by, sel):
        assert by == "css selector"
        return self.children[sel]


class _SwitchTo:
    def __init__(self, drv):
        self.drv = drv

    def frame(self, el):
        self.drv.log.append(("frame", el.sel))


class FakeWebDriver:
    """Deterministic in-memory 'browser': a dict of css selector → elements."""

    def __init__(self):
        self.log = []
        self.state = {}
        self.current_url = "about:blank"
        self.dom: dict[str, list[FakeElement]] = {}
        self.switch_to = _SwitchTo(self)
        self.closed = False
        opt = FakeElement(self, 'option[value="b"]')
        self.dom = {
            "#user": [FakeElement(self, "#user")],
            "#go": [FakeElement(self, "#go")],
            "form": [FakeElement(self, "form")],
            "#dd": [
                FakeElement(self, "#dd", children={'option[value="b"]': opt})
            ],
            "#slider": [FakeElement(self, "#slider")],
            "iframe": [FakeElement(self, "iframe")],
            "a.page": [
                FakeElement(self, "a.page", text="p1", attrs={"href": "u1"}),
                FakeElement(self, "a.page", text="p2", attrs={"href": "u2"}),
            ],
        }

    def get(self, uri):
        self.current_url = uri
        self.log.append(("get", uri))

    def find_elements(self, by, sel):
        assert by == "css selector"
        return self.dom.get(sel, [])

    def find_element(self, by, sel):
        els = self.find_elements(by, sel)
        if not els:
            raise RuntimeError(f"NoSuchElement: {sel}")
        return els[0]

    @property
    def page_source(self):
        last = self.state.get("last_click", "none")
        return f"<html><body><h1>clicked={last}</h1></body></html>"

    def execute_script(self, script):
        self.log.append(("script", script))
        if "readyState" in script:
            return "complete"
        return None

    def get_screenshot_as_png(self):
        return b"\x89PNG\r\n\x1a\nfakepng"

    def drag_and_drop_by_offset(self, el, dx, dy):
        self.log.append(("drag", el.sel, dx, dy))

    def delete_all_cookies(self):
        self.log.append(("reset",))

    def quit(self):
        self.closed = True
        self.log.append(("quit",))


@pytest.fixture()
def made():
    drivers: list[FakeWebDriver] = []

    def factory():
        d = FakeWebDriver()
        drivers.append(d)
        return d

    clear_driver_pool()
    yield factory, drivers
    clear_driver_pool()


def _conf(factory, **kw):
    return SpookyConf(
        cache_read=False,
        cache_write=False,
        fetch_retries=1,
        retry_delay_sec=0.0,
        webdriver_factory=factory,
        **kw,
    )


def test_full_interaction_trace_end_to_end(made):
    factory, drivers = made
    trace = Trace(
        (
            Visit("http://fake/login"),
            TextInput("#user", "alice"),
            Click("#go"),
            WaitFor("a.page", timeout_sec=1.0),
            WaitForDocumentReady(timeout_sec=1.0),
            Snapshot(),
        )
    )
    obs = fetch_trace(trace, _conf(factory))
    assert len(obs) == 1 and obs[0].success
    assert obs[0].uri == "http://fake/login"
    assert b"clicked=#go" in obs[0].content
    drv = drivers[0]
    assert ("get", "http://fake/login") in drv.log
    assert ("send_keys", "#user", "alice") in drv.log
    assert drv.dom["#user"][0].value == "alice"


def test_snapshot_and_screenshot_exports(made):
    factory, _ = made
    obs = fetch_trace(
        Trace((Visit("http://fake/x"), Snapshot(), Screenshot())), _conf(factory)
    )
    assert [o.mime for o in obs] == ["text/html; charset=utf-8", "image/png"]
    assert obs[1].content.startswith(b"\x89PNG")


def test_clicknext_excludes_visited_and_dropdown_toframe_slider_script(made):
    factory, drivers = made
    trace = Trace(
        (
            Visit("http://fake/x"),
            ClickNext("a.page"),
            ClickNext("a.page"),
            DropDownSelect("#dd", "b"),
            ToFrame("iframe"),
            DragSlider("#slider", 0.25),
            ExeScript("window.scrollTo(0, 99)"),
            Submit("form"),
            Snapshot(),
        )
    )
    obs = fetch_trace(trace, _conf(factory))
    assert len(obs) == 1 and obs[0].success
    log = drivers[0].log
    clicks = [e for e in log if e[0] == "click" and e[1] == "a.page"]
    assert [c[2] for c in clicks] == ["p1", "p2"]  # exclusion set honored
    assert ("click", 'option[value="b"]', "") in log
    assert ("frame", "iframe") in log
    assert ("drag", "#slider", 50, 0) in log
    assert ("script", "window.scrollTo(0, 99)") in log
    assert ("submit", "form") in log


def test_clicknext_exhausted_yields_error_observation(made):
    factory, _ = made
    trace = Trace(
        (Visit("u"), ClickNext("a.page"), ClickNext("a.page"), ClickNext("a.page"),
         Snapshot())
    )
    obs = fetch_trace(trace, _conf(factory))
    assert len(obs) == 1 and not obs[0].success
    assert "no unvisited element" in obs[0].error


def test_waitfor_timeout_is_error_evidence(made):
    factory, _ = made
    trace = Trace((Visit("u"), WaitFor("#missing", timeout_sec=0.2), Snapshot()))
    obs = fetch_trace(trace, _conf(factory))
    assert len(obs) == 1 and not obs[0].success
    assert "TimeoutError" in obs[0].error


def test_task_local_pool_reuses_and_factory_resets(made):
    factory, drivers = made
    conf = _conf(factory, webdriver_pool="task_local")
    fetch_trace(Trace((Visit("u1"), Snapshot())), conf)
    fetch_trace(Trace((Visit("u2"), Snapshot())), conf)
    assert len(drivers) == 1  # pooled: one browser for both traces
    assert ("reset",) in drivers[0].log  # factory reset between uses
    assert not drivers[0].closed


def test_transient_pool_quits_per_trace(made):
    factory, drivers = made
    conf = _conf(factory, webdriver_pool="transient")
    fetch_trace(Trace((Visit("u1"), Snapshot())), conf)
    fetch_trace(Trace((Visit("u2"), Snapshot())), conf)
    assert len(drivers) == 2  # one browser per trace
    assert all(d.closed for d in drivers)  # quit at agent close
