"""Ray-Data-native re-implementation of the data-processing capabilities of
elastic/opentelemetry-collector-components.

A brand-new engine (NOT a port): every stage is a ``ray.data.Dataset``
transform over zero-copy Arrow batches; stateful stages are actor pools;
wide steps use groupby/aggregate with explicit partitioning/salting.

Layout
------
- ``schema``     canonical Arrow schemas (transcripts + derived stages)
- ``synth``      deterministic transcript synthesis (shared SQL with the oracle)
- ``sources``    parquet / ndjson readers
- ``stages``     parse, enrich, route, aggregate, dedup, text, ann stages
- ``functions``  scalar kernels, hashing, sketches (HLL, MinHash, SimHash)
- ``pipelines``  composed pipelines + config validation
- ``state``      per-partition checkpoint manifests for resumable runs

Reference parity citations use ``file:line`` into /root/reference
(elastic/opentelemetry-collector-components v0.67.0).
"""

__version__ = "0.1.0"
