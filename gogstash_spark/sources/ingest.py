"""Driver-side pull inputs: exec and http.

The reference runs these on an interval forever (input/exec/
inputexec.go:20-33, input/http/inputhttp.go:17-24); the batch analog is
one pull per run — schedule reruns externally (cron / Airflow / the
streaming runner). The pull happens on the driver (it is one command /
one URL — there is nothing to distribute) and parallelizes immediately
after via spark.createDataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gogstash_spark import logevent


def _lines_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    return spark.createDataFrame([(ln,) for ln in lines], "%s string" % logevent.TEXT)


def exec_input(
    spark: SparkSession,
    command: str,
    args: list[str] | None = None,
    message_trim: str = " \t\r\n",
    message_prefix: str = "",
    message_type: str = "text",
    timeout: float = 60.0,
) -> DataFrame:
    """Run a command, one event per stdout line (message_type='text') or
    one event holding the whole stdout (message_type='json', decode with
    the json codec downstream). Reference input/exec/inputexec.go:20-33.
    """
    import subprocess

    out = subprocess.run(
        [command, *(args or [])], capture_output=True, text=True, timeout=timeout,
        check=True,
    ).stdout
    if message_type == "json":
        return _lines_df(spark, [out.strip(message_trim)])
    lines = [
        message_prefix + ln.strip(message_trim)
        for ln in out.splitlines()
        if ln.strip(message_trim)
    ]
    return _lines_df(spark, lines)


def http_input(
    spark: SparkSession,
    url: str,
    method: str = "GET",
    timeout: float = 10.0,
) -> DataFrame:
    """Fetch a URL, one event per response line (reference
    input/http/inputhttp.go:17-24 polls with GET/HEAD; HEAD yields one
    status event)."""
    import urllib.request

    req = urllib.request.Request(url, method=method)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if method == "HEAD":
            return _lines_df(spark, ["%s %d" % (url, resp.status)])
        body = resp.read().decode("utf-8", errors="replace")
    return _lines_df(spark, [ln for ln in body.splitlines() if ln])
