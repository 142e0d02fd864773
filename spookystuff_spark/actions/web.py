"""Browser-interaction actions (ref: module/web/.../actions/Foundation.scala:25-301,
WebInteraction.scala:17-59, Snapshot.scala:13-32, Screenshot.scala:11-30).

Execution is driver-agnostic: actions speak the small WebDriver protocol
(``find_element(s)("css selector", sel)``, ``get``, ``page_source``,
``execute_script``, …) that real selenium drivers already implement, so the
selenium import lives ONLY in the default factory. Any object with the same
surface can be injected via ``SpookyConf.webdriver_factory`` — which is how
the execution path (Click/Submit/Snapshot/pooling) is tested in this
selenium-free container, and how a playwright/CDP backend would plug in.

Driver pooling (ref: conf/DriverFactory.scala:31-158): ``task_local`` keeps
one browser per Python worker process (``spark.python.worker.reuse`` parity
with the reference's per-Spark-task pool, factory-reset between uses);
``transient`` creates per trace and quits at agent close.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

from spookystuff_spark.actions.core import Action, register_action
from spookystuff_spark.doc.observation import Doc

# selenium's By.CSS_SELECTOR literal — using the raw string keeps the actions
# import-free so fake/alternate drivers run them unchanged
CSS = "css selector"

_DRIVER_POOL: dict = {}  # per-worker singleton (task_local mode)


def _default_factory():
    try:
        from selenium import webdriver
    except ImportError as e:
        raise ImportError(
            "web actions require selenium (not installed here) or an injected "
            "SpookyConf.webdriver_factory; the trace algebra itself needs neither"
        ) from e
    return webdriver.Firefox()


def get_webdriver(agent, mode: Optional[str] = None):
    """Create-or-pool a webdriver per DriverFactory semantics."""
    conf = getattr(agent, "conf", None)
    factory = getattr(conf, "webdriver_factory", None) or _default_factory
    mode = mode or getattr(conf, "webdriver_pool", "task_local")
    if mode == "transient":
        return factory()
    drv = _DRIVER_POOL.get("driver")
    if drv is None:
        drv = factory()
        _DRIVER_POOL["driver"] = drv
    else:
        drv.delete_all_cookies()  # factory reset on reuse (DriverFactory parity)
    return drv


def release_webdriver(agent) -> None:
    """Agent-close hook: transient drivers quit; pooled drivers stay warm."""
    drv = agent.session_state.pop("webdriver", None)
    if drv is None:
        return
    mode = agent.session_state.pop("webdriver_mode", "task_local")
    if mode == "transient":
        try:
            drv.quit()
        except Exception:  # noqa: BLE001 — cleanup must not mask trace results
            pass


def clear_driver_pool() -> None:
    drv = _DRIVER_POOL.pop("driver", None)
    if drv is not None:
        try:
            drv.quit()
        except Exception:  # noqa: BLE001
            pass


class WebAction(Action):
    """Base: all browser steps mutate session state."""

    MAY_CHANGE_STATE = True

    def webdriver(self, agent):
        drv = agent.session_state.get("webdriver")
        if drv is None:
            mode = getattr(agent.conf, "webdriver_pool", "task_local")
            drv = get_webdriver(agent, mode)
            agent.session_state["webdriver"] = drv
            agent.session_state["webdriver_mode"] = mode
            agent.defer(lambda: release_webdriver(agent))
            agent.metrics_inc("sessions_initialized")
        return drv


@register_action
@dataclasses.dataclass(frozen=True)
class Visit(WebAction):
    """Navigate the browser (ref: Foundation.scala:25-37)."""

    uri: str = ""

    def execute(self, agent) -> list:
        self.webdriver(agent).get(self.uri)
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class Click(WebAction):
    selector: str = ""

    def execute(self, agent) -> list:
        self.webdriver(agent).find_element(CSS, self.selector).click()
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class ClickNext(WebAction):
    """Click the first not-yet-clicked match (ref: Foundation ClickNext);
    exclusion set lives in agent session state."""

    selector: str = ""

    def execute(self, agent) -> list:
        seen = agent.session_state.setdefault("clicknext_seen", set())
        for el in self.webdriver(agent).find_elements(CSS, self.selector):
            key = el.text or el.get_attribute("href") or ""
            if key not in seen:
                seen.add(key)
                el.click()
                return []
        raise RuntimeError(f"ClickNext: no unvisited element for {self.selector!r}")


@register_action
@dataclasses.dataclass(frozen=True)
class Submit(WebAction):
    selector: str = ""

    def execute(self, agent) -> list:
        self.webdriver(agent).find_element(CSS, self.selector).submit()
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class TextInput(WebAction):
    selector: str = ""
    text: str = ""

    def execute(self, agent) -> list:
        self.webdriver(agent).find_element(CSS, self.selector).send_keys(self.text)
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class DropDownSelect(WebAction):
    """Select an <option> by value — implemented via the element protocol
    (child lookup + click), the same thing selenium's Select helper does."""

    selector: str = ""
    value: str = ""

    def execute(self, agent) -> list:
        el = self.webdriver(agent).find_element(CSS, self.selector)
        el.find_element(CSS, f'option[value="{self.value}"]').click()
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class ToFrame(WebAction):
    selector: str = ""

    def execute(self, agent) -> list:
        drv = self.webdriver(agent)
        drv.switch_to.frame(drv.find_element(CSS, self.selector))
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class ExeScript(WebAction):
    script: str = ""

    def execute(self, agent) -> list:
        self.webdriver(agent).execute_script(self.script)
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class DragSlider(WebAction):
    selector: str = ""
    percentage: float = 0.5

    def execute(self, agent) -> list:
        drv = self.webdriver(agent)
        el = drv.find_element(CSS, self.selector)
        dx = int(el.size["width"] * self.percentage)
        try:
            from selenium.webdriver import ActionChains
        except ImportError:
            drv.drag_and_drop_by_offset(el, dx, 0)  # injected-driver protocol
            return []
        ActionChains(drv).drag_and_drop_by_offset(el, dx, 0).perform()
        return []


def _poll_until(check, timeout_sec: float, what: str) -> None:
    """Blocking wait (ref: WebInteraction.scala:17-59) — plain poll loop, no
    selenium WebDriverWait dependency."""
    deadline = time.monotonic() + timeout_sec
    while True:
        if check():
            return
        if time.monotonic() >= deadline:
            raise TimeoutError(f"WaitFor: {what} not satisfied in {timeout_sec}s")
        time.sleep(min(0.1, timeout_sec / 10))


@register_action
@dataclasses.dataclass(frozen=True)
class WaitFor(WebAction):
    """Block until selector present (ref: WebInteraction blocking waits)."""

    selector: str = ""
    timeout_sec: float = 10.0
    MAY_CHANGE_STATE = False

    def execute(self, agent) -> list:
        drv = self.webdriver(agent)
        _poll_until(
            lambda: len(drv.find_elements(CSS, self.selector)) > 0,
            self.timeout_sec,
            f"selector {self.selector!r}",
        )
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class WaitForDocumentReady(WebAction):
    timeout_sec: float = 10.0
    MAY_CHANGE_STATE = False

    def execute(self, agent) -> list:
        drv = self.webdriver(agent)
        _poll_until(
            lambda: drv.execute_script("return document.readyState") == "complete",
            self.timeout_sec,
            "document.readyState == complete",
        )
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class Snapshot(WebAction):
    """Export the live DOM as an html Doc (ref: Snapshot.scala:13-32)."""

    MAY_CHANGE_STATE = False
    HAS_EXPORT = True

    def execute(self, agent) -> list:
        drv = self.webdriver(agent)
        return [
            Doc(
                uri=drv.current_url,
                mime="text/html; charset=utf-8",
                content=drv.page_source.encode(),
            )
        ]


@register_action
@dataclasses.dataclass(frozen=True)
class Screenshot(WebAction):
    """Export a PNG Doc of the viewport (ref: Screenshot.scala:11-30)."""

    MAY_CHANGE_STATE = False
    HAS_EXPORT = True

    def execute(self, agent) -> list:
        drv = self.webdriver(agent)
        return [
            Doc(
                uri=drv.current_url,
                mime="image/png",
                content=drv.get_screenshot_as_png(),
            )
        ]
