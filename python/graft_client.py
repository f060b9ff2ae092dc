#!/usr/bin/env python3
"""Thin Python client for the graft HTTP server — the Spark-deployment
counterpart of the reference's embedded Python bindings
(reference `python/src/lib.rs`: SparqlDatabase.execute_query /
add_rule / RSP). An engine that runs on a Spark cluster is driven over
its SPARQL protocol endpoint rather than linked in-process, so the
binding is an HTTP client; it needs nothing outside the standard
library.

Batch:
    from graft_client import GraftClient
    c = GraftClient("http://localhost:8080")
    rows = c.query("SELECT ?s ?o WHERE { ?s <http://ex/p> ?o }")
    # rows: list of {var: value} dicts

    # query over inline data, with forward-chaining rules:
    rows = c.query(q, rdf="<a> <p> <b> .", format="ntriples",
                   rules="RULE :anc(?x,?z) :- ...")

Streaming (RSP-QL):
    sid, streams = c.rsp_register(rsp_query)
    c.rsp_push(sid, "s1", "<a> <http://ex/p> <b> .", timestamp=10)
    for ev in c.rsp_events(sid, max_events=5):
        print(ev)   # {'kind': 'row', 'data': {...}} | {'kind': 'firing'}

Run this file directly to smoke-test a live server:
    python3 graft_client.py http://localhost:8080
"""

import json
import urllib.error
import urllib.request


class GraftError(Exception):
    """A categorized engine error (the server's error taxonomy):
    category is one of 'syntax' (SPARQL parse failure, annotated
    diagnostic in the message), 'unsupported' (documented refusal),
    'data' (inputs wrong for a well-formed query), 'request'
    (protocol-shape problem) or 'internal'."""

    def __init__(self, message, category, status):
        super().__init__(message)
        self.category = category
        self.status = status


class GraftClient:
    def __init__(self, base_url, timeout=60):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def _post(self, path, payload):
        req = urllib.request.Request(
            self.base + path,
            data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            try:
                err = json.loads(e.read().decode("utf-8"))
            except Exception:
                raise e
            raise GraftError(err.get("error", str(e)),
                             err.get("category", "internal"), e.code) from None

    def query(self, sparql, rdf=None, format=None, rules=None):
        """Run one SPARQL query; returns a list of {var: value} dicts.

        rdf/format: query inline data instead of the server's base store
        (format: ntriples | turtle | rdfxml). rules: RULE definitions
        applied by the forward-chaining reasoner before the query.
        """
        body = {"sparql": sparql}
        if rdf is not None:
            body["rdf"] = rdf
            body["format"] = format or "ntriples"
        if rules is not None:
            body["rule" if isinstance(rules, str) else "rules"] = rules
        out = self._post("/query", body)
        data = out["results"][0]["data"]
        return [dict(pair for pair in row) for row in data]

    def queries(self, sparqls, **kw):
        """Run several queries in one request; list of row-lists.
        Accepts the same rdf/format/rules keywords as query()."""
        body = {"queries": list(sparqls)}
        if kw.get("rdf") is not None:
            body["rdf"] = kw["rdf"]
            body["format"] = kw.get("format") or "ntriples"
        rules = kw.get("rules")
        if rules is not None:
            body["rule" if isinstance(rules, str) else "rules"] = rules
        out = self._post("/query", body)
        by_index = sorted(out["results"], key=lambda r: r["query_index"])
        return [[dict(p for p in row) for row in r["data"]] for r in by_index]

    def rsp_query(self, query, events, static_rdf=None, static_format=None):
        """One-shot RSP: replay (stream, timestamp, ntriples) events
        through an RSP-QL query; returns the emitted rows as
        {var: value} dicts (the server answers a header row + data
        rows)."""
        body = {"query": query,
                "events": [{"stream": st, "timestamp": ts, "ntriples": nt}
                           for (st, ts, nt) in events]}
        if static_rdf is not None:
            body["static_rdf"] = static_rdf
            body["static_format"] = static_format or "ntriples"
        out = self._post("/rsp-query", body)
        data = out["data"]
        if not data:
            return []
        headers, rows = data[0], data[1:]
        return [dict(zip(headers, r)) for r in rows]

    def rsp_register(self, query, static_rdf=None, static_format=None,
                     sparql_rules=None):
        """Register a persistent RSP session; returns (session_id, streams)."""
        body = {"query": query}
        if static_rdf is not None:
            body["static_rdf"] = static_rdf
            body["static_format"] = static_format or "ntriples"
        if sparql_rules is not None:
            body["sparql_rules"] = sparql_rules
        out = self._post("/rsp/register", body)
        return out["session_id"], out.get("streams", [])

    def rsp_push(self, session_id, stream, ntriples, timestamp):
        """Push N-Triples into a registered session's stream."""
        return self._post("/rsp/push", {
            "session_id": session_id, "stream": stream,
            "ntriples": ntriples, "timestamp": timestamp})

    def rsp_events(self, session_id, max_events=None, timeout=None):
        """Yield events from the session's SSE channel:
        {'kind': 'row', 'data': {...}} for result rows and
        {'kind': 'firing'} at each push boundary. ``max_events`` counts
        ROW events only -- firing markers are interleaved bookkeeping,
        not results, so a caller asking for N events is guaranteed N
        rows (the generator returns after yielding the Nth row)."""
        req = urllib.request.Request(
            f"{self.base}/rsp/events/{session_id}",
            headers={"Accept": "text/event-stream"})
        n = 0
        with urllib.request.urlopen(
                req, timeout=timeout or self.timeout) as resp:
            event_name = None
            for raw in resp:
                # tolerate \r\n line endings (SSE servers may emit either)
                line = raw.decode("utf-8").rstrip("\r\n")
                if line.startswith("event:"):
                    event_name = line[6:].strip()
                elif line.startswith("data:"):
                    payload = line[5:].strip()
                    if event_name == "firing":
                        yield {"kind": "firing"}
                    else:
                        yield {"kind": "row", "data": json.loads(payload)}
                        n += 1
                        if max_events is not None and n >= max_events:
                            return
                    event_name = None


def _smoke(base_url):
    c = GraftClient(base_url)
    rows = c.query(
        "SELECT ?s ?o WHERE { ?s <http://ex/p> ?o }",
        rdf="<http://ex/a> <http://ex/p> <http://ex/b> .\n"
            "<http://ex/c> <http://ex/p> <http://ex/d> .")
    assert len(rows) == 2 and {"s", "o"} <= set(rows[0]), rows
    print("query over inline rdf:", rows)

    try:
        c.query("SELECT ?s WHERE { ?s <p> }")
        raise AssertionError("malformed query did not raise")
    except GraftError as e:
        assert e.category == "syntax" and e.status == 400, (e.category, e.status)
    print("categorized syntax error: OK")

    inferred = c.query(
        "SELECT ?x ?z WHERE { ?x <http://ex/anc> ?z }",
        rdf="<http://ex/a> <http://ex/parent> <http://ex/b> .\n"
            "<http://ex/b> <http://ex/parent> <http://ex/c> .",
        rules="""RULE <r/anc> :- CONSTRUCT { ?x <http://ex/anc> ?z }
                 WHERE { ?x <http://ex/parent> ?y .
                         ?y <http://ex/parent> ?z }""")
    assert inferred and inferred[0] == {"x": "http://ex/a",
                                        "z": "http://ex/c"}, inferred
    print("rule-inferred rows:", inferred)

    oneshot = c.rsp_query(
        "REGISTER RSTREAM <http://out> AS SELECT * "
        "FROM NAMED WINDOW :w ON ?stream [RANGE 10 ms STEP 10 ms] "
        "WHERE { WINDOW :w { ?s <http://ex/p> ?o . } }",
        [("s1", 5, "<http://ex/a> <http://ex/p> <http://ex/b> ."),
         ("s1", 15, "<http://ex/c> <http://ex/p> <http://ex/d> .")])
    assert oneshot and oneshot[0].get("s") == "http://ex/a", oneshot
    print("one-shot rsp rows:", oneshot)

    sid, streams = c.rsp_register(
        "REGISTER RSTREAM <http://out> AS SELECT * "
        "FROM NAMED WINDOW :w ON ?stream [RANGE 10 ms STEP 10 ms] "
        "WHERE { WINDOW :w { ?s <http://ex/p> ?o . } }")
    print("session:", sid, "streams:", streams)
    c.rsp_push(sid, "s1", "<http://ex/a> <http://ex/p> <http://ex/b> .", 5)
    c.rsp_push(sid, "s1", "<http://ex/e> <http://ex/p> <http://ex/f> .", 15)
    # the ts=15 push closes the (0,10] window -> exactly one row; ask
    # for one row and let interleaved firing markers pass through
    got = list(c.rsp_events(sid, max_events=1))
    rows = [e for e in got if e["kind"] == "row"]
    assert len(rows) == 1, got
    print("rsp events:", got)
    print("smoke OK")


if __name__ == "__main__":
    import sys
    _smoke(sys.argv[1] if len(sys.argv) > 1 else "http://localhost:8080")
