package graft.server

/** Embedded single-file query playground — the Spark counterpart of the
  * reference's `web/playground.html` (a CodeMirror page that drives the
  * same four endpoints: fetch('/query') at playground.html:2396,
  * '/rsp/register' at :2576, '/rsp/push' at :2779, plus the SSE event
  * stream). This one is dependency-free by design: the container (and a
  * locked-down cluster edge node) has no CDN egress, so the page uses a
  * plain textarea + table and inlines all styling. Served by
  * [[GraftHttpServer]] at `GET /`.
  *
  * Two panes:
  *  - Query: SPARQL text (+ optional inline RDF payload with a format
  *    selector) POSTed to `/query`; rows render as a table with the
  *    server-reported execution time.
  *  - RSP: register an RSP-QL query (`/rsp/register`), push timestamped
  *    N-Triples into a named stream (`/rsp/push`), and watch emitted
  *    bindings arrive live over the `/rsp/events/<session>` SSE channel.
  */
object Playground {
  val html: String = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="UTF-8"/>
<title>Graft Playground</title>
<style>
  body { font-family: ui-monospace, Consolas, monospace; margin: 0;
         background: #161618; color: #e4e4e4; }
  header { padding: 10px 16px; background: #202024;
           border-bottom: 1px solid #333; }
  header h1 { font-size: 16px; margin: 0; display: inline; }
  header span { color: #888; font-size: 12px; margin-left: 12px; }
  nav button { margin-right: 8px; }
  main { padding: 16px; max-width: 1100px; }
  textarea { width: 100%; box-sizing: border-box; background: #1d1d21;
             color: #e4e4e4; border: 1px solid #3a3a40; border-radius: 4px;
             padding: 8px; font: 13px ui-monospace, Consolas, monospace; }
  button { background: #31424f; color: #e4e4e4; border: 1px solid #4a5c6a;
           border-radius: 4px; padding: 6px 14px; cursor: pointer;
           font: 13px ui-monospace, Consolas, monospace; }
  button:hover { background: #3c5263; }
  select, input { background: #1d1d21; color: #e4e4e4;
                  border: 1px solid #3a3a40; border-radius: 4px;
                  padding: 5px; font: 13px ui-monospace, monospace; }
  table { border-collapse: collapse; margin-top: 10px; font-size: 13px; }
  th, td { border: 1px solid #3a3a40; padding: 4px 10px; text-align: left; }
  th { background: #26262b; }
  .row { display: flex; gap: 8px; align-items: center; margin: 8px 0; }
  .muted { color: #888; font-size: 12px; }
  .err { color: #ff8787; white-space: pre-wrap; }
  #rspEvents { background: #1d1d21; border: 1px solid #3a3a40;
               border-radius: 4px; padding: 8px; min-height: 80px;
               max-height: 300px; overflow-y: auto; font-size: 12px; }
  .pane { display: none; } .pane.active { display: block; }
  h2 { font-size: 14px; color: #aaa; }
</style>
</head>
<body>
<header>
  <h1>Graft Playground</h1><span>SPARQL &amp; RSP-QL over HTTP</span>
  <nav style="float:right">
    <button onclick="show('query')">Query</button>
    <button onclick="show('rsp')">RSP</button>
  </nav>
</header>
<main>
<div id="pane-query" class="pane active">
  <h2>SPARQL query &rarr; POST /query</h2>
  <textarea id="sparql" rows="8">SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 20</textarea>
  <h2>Optional RDF payload (queried instead of the server store when non-empty)</h2>
  <textarea id="rdf" rows="4" placeholder="<http://ex/a> <http://ex/p> <http://ex/b> ."></textarea>
  <div class="row">
    <label class="muted">format</label>
    <select id="fmt"><option>ntriples</option><option>turtle</option><option>rdfxml</option></select>
    <button onclick="runQuery()">Run</button>
    <span id="qtime" class="muted"></span>
  </div>
  <div id="qout"></div>
</div>
<div id="pane-rsp" class="pane">
  <h2>1. Register RSP-QL query &rarr; POST /rsp/register</h2>
  <textarea id="rspq" rows="7">REGISTER RSTREAM &lt;http://out&gt; AS
SELECT *
FROM NAMED WINDOW :w ON ?stream [RANGE 10 ms STEP 10 ms]
WHERE { WINDOW :w { ?s &lt;http://ex/p&gt; ?o . } }</textarea>
  <div class="row">
    <button onclick="rspRegister()">Register</button>
    <span id="rspsess" class="muted"></span>
  </div>
  <h2>2. Push N-Triples &rarr; POST /rsp/push</h2>
  <textarea id="rspnt" rows="3">&lt;http://ex/a&gt; &lt;http://ex/p&gt; &lt;http://ex/b&gt; .</textarea>
  <div class="row">
    <label class="muted">stream</label><input id="rspstream" value="s1" size="8"/>
    <label class="muted">timestamp</label><input id="rspts" value="10" size="8"/>
    <button onclick="rspPush()">Push</button>
  </div>
  <h2>3. Emitted bindings (SSE /rsp/events)</h2>
  <div id="rspEvents" class="muted">register a query first</div>
</div>
</main>
<script>
function esc(s) {
  return String(s).replace(/&/g, '&amp;').replace(/</g, '&lt;');
}
function show(p) {
  document.querySelectorAll('.pane').forEach(function (e) {
    e.classList.remove('active');
  });
  document.getElementById('pane-' + p).classList.add('active');
}
function renderTable(rows) {
  if (!rows.length) return '<p class="muted">0 rows</p>';
  var vars = [];
  rows.forEach(function (r) { r.forEach(function (kv) {
    if (vars.indexOf(kv[0]) < 0) vars.push(kv[0]);
  }); });
  var h = '<table><tr>' + vars.map(function (v) {
    return '<th>?' + esc(v) + '</th>';
  }).join('') + '</tr>';
  rows.forEach(function (r) {
    var m = {};
    r.forEach(function (kv) { m[kv[0]] = kv[1]; });
    h += '<tr>' + vars.map(function (v) {
      return '<td>' + (m[v] === undefined || m[v] === null ? '' : esc(m[v])) + '</td>';
    }).join('') + '</tr>';
  });
  return h + '</table>';
}
async function runQuery() {
  var out = document.getElementById('qout');
  out.innerHTML = '<p class="muted">running…</p>';
  var body = { sparql: document.getElementById('sparql').value };
  var rdf = document.getElementById('rdf').value.trim();
  if (rdf) { body.rdf = rdf; body.format = document.getElementById('fmt').value; }
  try {
    var resp = await fetch('/query', { method: 'POST',
      headers: { 'Content-Type': 'application/json' },
      body: JSON.stringify(body) });
    var j = await resp.json();
    if (!resp.ok) { out.innerHTML = '<p class="err">' + esc(j.error || resp.status) + '</p>'; return; }
    var r = j.results[0];
    document.getElementById('qtime').textContent =
      r.data.length + ' rows · ' + r.execution_time_ms + ' ms';
    out.innerHTML = renderTable(r.data);
  } catch (e) { out.innerHTML = '<p class="err">' + esc(e) + '</p>'; }
}
var sse = null;
async function rspRegister() {
  var resp = await fetch('/rsp/register', { method: 'POST',
    headers: { 'Content-Type': 'application/json' },
    body: JSON.stringify({ query: document.getElementById('rspq').value }) });
  var j = await resp.json();
  var tag = document.getElementById('rspsess');
  if (!resp.ok) { tag.textContent = 'error: ' + (j.error || resp.status); return; }
  tag.textContent = 'session ' + j.session_id + ' · streams ' + j.streams.join(', ');
  var log = document.getElementById('rspEvents');
  log.textContent = '';
  if (sse) sse.close();
  sse = new EventSource('/rsp/events/' + j.session_id);
  sse.onmessage = function (ev) {
    var d = document.createElement('div');
    d.textContent = ev.data;
    log.appendChild(d); log.scrollTop = log.scrollHeight;
  };
  sse.addEventListener('firing', function () {
    var d = document.createElement('div');
    d.className = 'muted'; d.textContent = '— firing —';
    log.appendChild(d); log.scrollTop = log.scrollHeight;
  });
  window.rspSession = j.session_id;
}
async function rspPush() {
  if (!window.rspSession) { alert('register first'); return; }
  await fetch('/rsp/push', { method: 'POST',
    headers: { 'Content-Type': 'application/json' },
    body: JSON.stringify({ session_id: window.rspSession,
      stream: document.getElementById('rspstream').value,
      ntriples: document.getElementById('rspnt').value,
      timestamp: parseInt(document.getElementById('rspts').value, 10) }) });
}
</script>
</body>
</html>
"""
}
