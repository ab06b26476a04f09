"""Hierarchical span tracing (tracing-forest parity, SURVEY.md §5.1).

The reference instruments every prover/verifier phase with `info_span!` /
`#[tracing::instrument]` and renders a span-timing tree per proof
(test.rs:9-17, README.md:66-104 profiling pies come from these spans).

Usage:
    with span("GKR prove"):
        with span("LassoNode::prove_claim_reduction"):
            ...
    print(render_last_tree())

Spans nest via a thread-local stack; each records wall time and children.
Enable auto-printing with HYPERGRECO_TRACE=1. `jax.block_until_ready` is NOT
inserted automatically — device work is async, so a span measures the time
until its last host-blocking operation (same caveat as any async tracer);
wrap the value in `sync()` at span exit where exact device attribution
matters.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import List, Optional

_TLS = threading.local()


@dataclass
class Span:
    name: str
    start: float = 0.0
    elapsed: float = 0.0
    children: List["Span"] = field(default_factory=list)
    meta: Optional[dict] = None

    def render(self, indent: int = 0, parent_elapsed: Optional[float] = None):
        pct = (
            f" [{100 * self.elapsed / parent_elapsed:5.1f}%]"
            if parent_elapsed
            else ""
        )
        lines = [f"{'  ' * indent}{self.name}: {self.elapsed * 1e3:.1f}ms{pct}"]
        for c in self.children:
            lines.extend(c.render(indent + 1, self.elapsed or None))
        return lines


def _stack() -> list:
    if not hasattr(_TLS, "stack"):
        _TLS.stack = []
        _TLS.roots = []
    return _TLS.stack


@contextmanager
def span(name: str, **meta):
    st = _stack()
    s = Span(name=name, start=time.perf_counter(), meta=meta or None)
    if st:
        st[-1].children.append(s)
    st.append(s)
    try:
        yield s
    finally:
        s.elapsed = time.perf_counter() - s.start
        st.pop()
        if not st:
            _TLS.roots.append(s)
            if os.environ.get("HYPERGRECO_TRACE"):
                print("\n".join(s.render()))


def sync(x):
    """Block on device values inside a span (attribute async device time)."""
    import jax

    jax.block_until_ready(x)
    return x


def last_tree() -> Optional[Span]:
    _stack()
    return _TLS.roots[-1] if _TLS.roots else None


def render_last_tree() -> str:
    t = last_tree()
    return "\n".join(t.render()) if t else "(no spans recorded)"


def reset():
    _TLS.stack = []
    _TLS.roots = []
