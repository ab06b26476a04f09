"""Span tracing: nesting, timing, render (tracing-forest parity)."""

from hypergreco_tpu.utils import tracing


def test_span_nesting_and_render():
    tracing.reset()
    with tracing.span("prove"):
        with tracing.span("witness gen"):
            pass
        with tracing.span("GKR prove"):
            with tracing.span("LassoNode"):
                pass
    t = tracing.last_tree()
    assert t.name == "prove"
    assert [c.name for c in t.children] == ["witness gen", "GKR prove"]
    assert t.children[1].children[0].name == "LassoNode"
    assert t.elapsed >= sum(c.elapsed for c in t.children) * 0.5
    out = tracing.render_last_tree()
    assert "prove" in out and "LassoNode" in out and "ms" in out


def test_spans_survive_exceptions():
    tracing.reset()
    try:
        with tracing.span("outer"):
            with tracing.span("inner"):
                raise ValueError("boom")
    except ValueError:
        pass
    t = tracing.last_tree()
    assert t.name == "outer" and t.children[0].name == "inner"
    assert t.elapsed > 0
