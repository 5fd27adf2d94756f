"""Allocator-tuning probe: decision plumbing (the actual mallopt effect
is host-dependent and benchmarked, not unit-testable)."""

import os

from opentelemetry_collector_components_ray.functions.allocprobe import (
    probe_malloc_tuning,
    resolve_malloc_tuning,
)


def test_probe_shape_and_guards():
    r = probe_malloc_tuning(nproc=2)
    assert set(r) == {"enable", "untuned_gbps", "tuned_gbps", "nproc"}
    assert r["untuned_gbps"] > 0 and r["tuned_gbps"] > 0
    # decision rule: both guards must fire
    assert r["enable"] == (
        r["untuned_gbps"] < 1.0
        and r["tuned_gbps"] >= 2.0 * r["untuned_gbps"]
    )


def test_resolve_honors_explicit_env(monkeypatch):
    monkeypatch.setenv("OCCR_MALLOC_TUNING", "0")
    assert resolve_malloc_tuning() == {"enable": False, "source": "env"}
    monkeypatch.setenv("OCCR_MALLOC_TUNING", "1")
    assert resolve_malloc_tuning() == {"enable": True, "source": "env"}


def test_resolve_probe_exports_decision(monkeypatch):
    monkeypatch.delenv("OCCR_MALLOC_TUNING", raising=False)
    r = resolve_malloc_tuning()
    assert r["source"] == "probe"
    assert os.environ["OCCR_MALLOC_TUNING"] == ("1" if r["enable"] else "0")
