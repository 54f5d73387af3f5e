"""Minimal gradio stub: records the component graph so the demo UIs can be
built and inspected headlessly (gradio itself is an optional dependency)."""
from __future__ import annotations

from typing import Any, Dict, List


class _Event:
    def __init__(self, registry):
        self._registry = registry

    def then(self, fn=None, inputs=None, outputs=None, **kw):
        self._registry.append({"fn": fn, "inputs": inputs, "outputs": outputs})
        return self


class Component:
    def __init__(self, kind: str, **kw):
        self.kind = kind
        self.kw = kw
        self.events: List[Dict[str, Any]] = []
        Blocks.current.components.append(self)

    def click(self, fn=None, inputs=None, outputs=None, **kw):
        self.events.append({"trigger": "click", "fn": fn,
                            "inputs": inputs, "outputs": outputs})
        return _Event(self.events)

    def change(self, fn=None, inputs=None, outputs=None, **kw):
        self.events.append({"trigger": "change", "fn": fn,
                            "inputs": inputs, "outputs": outputs})
        return _Event(self.events)


def _component(kind):
    def make(*a, **kw):
        return Component(kind, args=a, **kw)
    make.__name__ = kind
    return make


Markdown = _component("Markdown")
Textbox = _component("Textbox")
Slider = _component("Slider")
Dropdown = _component("Dropdown")
Audio = _component("Audio")
Button = _component("Button")
File = _component("File")
HTML = _component("HTML")


class _Container:
    def __init__(self, *a, **kw):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


Row = _Container
Column = _Container


class Blocks(_Container):
    current: "Blocks" = None

    def __init__(self, *a, **kw):
        self.kw = kw
        self.components: List[Component] = []

    def __enter__(self):
        Blocks.current = self
        return self

    def __exit__(self, *exc):
        return False

    def queue(self, **kw):
        return self

    def launch(self, **kw):
        raise RuntimeError("stub Blocks cannot launch")

    # ---- introspection helpers for tests ----
    def by_kind(self, kind: str) -> List[Component]:
        return [c for c in self.components if c.kind == kind]


def update(**kw):
    return {"__type__": "update", **kw}
