"""Browser-interaction actions (ref: module/web/.../actions/Foundation.scala:25-301,
WebInteraction.scala:17-59, Snapshot.scala:13-32, Screenshot.scala:11-30).

Selenium is optional (absent from this container): the action algebra, trace
serialization, dedup keys and driver-pooling shape are fully functional — only
``execute`` requires a webdriver, failing with a clear ImportError otherwise
(errors surface as ErrorObservation rows, never task-killers).

Driver pooling (ref: conf/DriverFactory.scala:31-158): ``task_local`` keeps one
browser per Python worker process (``spark.python.worker.reuse`` parity with
the reference's per-Spark-task pool, factory-reset between uses);
``transient`` creates/quits per trace.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from spookystuff_spark.actions.core import NO_OP, Action, Trace, register_action
from spookystuff_spark.doc.observation import Doc

_DRIVER_POOL: dict = {}  # per-worker singleton (task_local mode)


def _require_selenium():
    try:
        import selenium  # noqa: F401

        return selenium
    except ImportError as e:
        raise ImportError(
            "web actions require selenium, which is not installed in this "
            "environment; the trace algebra still works — only execution needs it"
        ) from e


def get_webdriver(agent, mode: str = "task_local"):
    _require_selenium()
    from selenium import webdriver

    if mode == "transient":
        return webdriver.Firefox()
    drv = _DRIVER_POOL.get("driver")
    if drv is None:
        drv = webdriver.Firefox()
        _DRIVER_POOL["driver"] = drv
    else:
        drv.delete_all_cookies()  # factory reset on reuse (DriverFactory parity)
    return drv


class WebAction(Action):
    """Base: all browser steps mutate session state."""

    MAY_CHANGE_STATE = True

    def webdriver(self, agent):
        drv = agent.session_state.get("webdriver")
        if drv is None:
            drv = get_webdriver(agent)
            agent.session_state["webdriver"] = drv
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
        from selenium.webdriver.common.by import By

        self.webdriver(agent).find_element(By.CSS_SELECTOR, self.selector).click()
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class ClickNext(WebAction):
    """Click the first not-yet-clicked match (ref: Foundation ClickNext);
    exclusion set lives in agent session state."""

    selector: str = ""

    def execute(self, agent) -> list:
        from selenium.webdriver.common.by import By

        seen = agent.session_state.setdefault("clicknext_seen", set())
        for el in self.webdriver(agent).find_elements(By.CSS_SELECTOR, self.selector):
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
        from selenium.webdriver.common.by import By

        self.webdriver(agent).find_element(By.CSS_SELECTOR, self.selector).submit()
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class TextInput(WebAction):
    selector: str = ""
    text: str = ""

    def execute(self, agent) -> list:
        from selenium.webdriver.common.by import By

        self.webdriver(agent).find_element(By.CSS_SELECTOR, self.selector).send_keys(
            self.text
        )
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class DropDownSelect(WebAction):
    selector: str = ""
    value: str = ""

    def execute(self, agent) -> list:
        from selenium.webdriver.common.by import By
        from selenium.webdriver.support.ui import Select

        el = self.webdriver(agent).find_element(By.CSS_SELECTOR, self.selector)
        Select(el).select_by_value(self.value)
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class ToFrame(WebAction):
    selector: str = ""

    def execute(self, agent) -> list:
        from selenium.webdriver.common.by import By

        drv = self.webdriver(agent)
        drv.switch_to.frame(drv.find_element(By.CSS_SELECTOR, self.selector))
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
        from selenium.webdriver import ActionChains
        from selenium.webdriver.common.by import By

        drv = self.webdriver(agent)
        el = drv.find_element(By.CSS_SELECTOR, self.selector)
        width = el.size["width"]
        ActionChains(drv).drag_and_drop_by_offset(
            el, int(width * self.percentage), 0
        ).perform()
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class WaitFor(WebAction):
    """Block until selector present (ref: WebInteraction blocking waits)."""

    selector: str = ""
    timeout_sec: float = 10.0
    MAY_CHANGE_STATE = False

    def execute(self, agent) -> list:
        from selenium.webdriver.common.by import By
        from selenium.webdriver.support import expected_conditions as EC
        from selenium.webdriver.support.ui import WebDriverWait

        WebDriverWait(self.webdriver(agent), self.timeout_sec).until(
            EC.presence_of_element_located((By.CSS_SELECTOR, self.selector))
        )
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class WaitForDocumentReady(WebAction):
    timeout_sec: float = 10.0
    MAY_CHANGE_STATE = False

    def execute(self, agent) -> list:
        from selenium.webdriver.support.ui import WebDriverWait

        WebDriverWait(self.webdriver(agent), self.timeout_sec).until(
            lambda d: d.execute_script("return document.readyState") == "complete"
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
