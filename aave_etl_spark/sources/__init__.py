"""Source connectors (SURVEY.md §2.1 rows S1–S20).

Every reference scan is an external API fetched per partition with
exponential-backoff retry (helpers.py:20-21, 192-205). Here each connector
is *interface-first*: a declared output schema (`schemas.py`), a fetch
implemented against an injectable transport (`base.Transport`), and two
execution shapes:

- driver-side fetch → ``spark.createDataFrame`` for per-partition scans
  that return small frames (block lookups, price scans, seeds);
- executor-side fan-out → ``mapInPandas`` over a DataFrame of request keys
  for per-token/per-address sweeps, preserving the reference's bounded
  concurrency (asyncio.Semaphore(20), protocol_data_lake.py:855).

No network calls happen in this container: tests inject fake transports,
and ``fixtures.FixtureTransport`` serves deterministic reference-shaped
payloads. A production deployment injects a real HTTP/RPC transport with
the same signature.
"""

from aave_etl_spark.sources.base import (
    RetryPolicy,
    Transport,
    retrying,
)

__all__ = ["RetryPolicy", "Transport", "retrying"]
