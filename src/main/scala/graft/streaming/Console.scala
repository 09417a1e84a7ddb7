package graft.streaming

/** Embedded operator console (reference `console/` — a React SPA over
  * the server API; arkflow-server serves it beside the JSON routes).
  * Spark-side equivalent: ONE self-contained HTML page over the same
  * [[ControlPlane]] JSON API — no build step, no external assets (the
  * deployment target is zero-egress clusters), no framework. It covers
  * the operator loop the reference console exists for: watch streams,
  * stop/start/restart them, edit a draft config, diff it against the
  * active version, validate + apply it, inspect and roll back versions,
  * tail the event log live, and review the actor-stamped `/audit`
  * mutation log. Everything else (task-level drill-down,
  * metrics timelines) is Structured Streaming's own Spark UI's job.
  *
  * The event table prefers the `/events/stream` SSE tail (consumed via
  * streaming fetch, NOT EventSource — EventSource cannot send the
  * Authorization header) and falls back to the 3 s `/events` poll when
  * the stream is unavailable; `#evmode` shows which path is live.
  *
  * The page keeps the bearer token in localStorage and sends it as the
  * Authorization header on every fetch — same middleware contract as
  * the JSON routes.
  */
object Console {
  val Page: String =
    """<!doctype html>
      |<html lang="en"><head><meta charset="utf-8">
      |<title>graft console</title>
      |<style>
      |  body{font-family:ui-monospace,Menlo,Consolas,monospace;margin:1.2rem;
      |       background:#111;color:#ddd;font-size:14px}
      |  h1{font-size:18px;margin:0 0 .6rem} h2{font-size:15px;margin:1.2rem 0 .4rem}
      |  table{border-collapse:collapse;width:100%;margin:.3rem 0}
      |  th,td{border:1px solid #333;padding:.25rem .5rem;text-align:left;
      |        vertical-align:top;word-break:break-all}
      |  th{background:#1b1b1b} tr:nth-child(even){background:#161616}
      |  button{background:#263238;color:#ddd;border:1px solid #455;padding:.15rem .6rem;
      |         cursor:pointer;margin-right:.3rem} button:hover{background:#37474f}
      |  textarea{width:100%;min-height:10rem;background:#161616;color:#ddd;
      |           border:1px solid #333;box-sizing:border-box}
      |  input{background:#161616;color:#ddd;border:1px solid #333;padding:.2rem}
      |  #msg{white-space:pre-wrap;color:#9c9;margin:.4rem 0} .err{color:#e77}
      |  .ok{color:#9c9} .badge{color:#8ab4f8} #status{margin:.2rem 0 .6rem;color:#9c9}
      |  #status .down{color:#e77}
      |</style></head><body>
      |<h1>graft console <span id="sys" class="badge"></span></h1>
      |<div id="status"></div>
      |<div>token <input id="tok" size="24" placeholder="bearer token (if set)">
      |  <button onclick="saveTok()">save</button></div>
      |<h2>streams</h2>
      |<table id="streams"><tr><th>name</th><th>id</th><th>active</th>
      |  <th>pipeline</th><th>actions</th></tr></table>
      |<h2>recent events <span id="evmode" class="badge"></span></h2>
      |<table id="events"><tr><th>time</th><th>type</th><th>stream</th>
      |  <th>message</th></tr></table>
      |<h2>audit</h2>
      |<table id="audit"><tr><th>time</th><th>actor</th><th>resource</th>
      |  <th>operation</th><th>state</th><th>detail</th></tr></table>
      |<h2>components</h2>
      |<table id="components"><tr><th>kind</th><th>registered</th></tr></table>
      |<h2>config versions</h2>
      |<table id="versions"><tr><th>id</th><th>created</th><th>bytes</th>
      |  <th>active</th><th>actions</th></tr></table>
      |<h2>config</h2>
      |<textarea id="cfg" placeholder="streams: ..."></textarea><br>
      |<button onclick="loadDraft()">load draft</button>
      |<button onclick="saveDraft()">save draft</button>
      |<button onclick="diffActive()">diff vs active</button>
      |<button onclick="act('validate')">validate</button>
      |<button onclick="act('apply')">apply</button>
      |<div id="msg"></div>
      |<script>
      |const $ = id => document.getElementById(id);
      |$('tok').value = localStorage.getItem('graft_tok') || '';
      |function saveTok(){ localStorage.setItem('graft_tok', $('tok').value); refresh(); }
      |function hdrs(){ const t = localStorage.getItem('graft_tok');
      |  return t ? {'Authorization': 'Bearer ' + t} : {}; }
      |async function call(path, method, body){
      |  const r = await fetch(path, {method: method || 'GET', headers: hdrs(), body});
      |  const txt = await r.text();
      |  let j; try { j = JSON.parse(txt); } catch(e) { j = {raw: txt}; }
      |  return {code: r.status, body: j};
      |}
      |function show(r){ $('msg').textContent = JSON.stringify(r.body, null, 1);
      |  $('msg').className = r.code < 400 ? 'ok' : 'err'; }
      |async function lifecycle(id, op){ show(await call('/streams/' + id + '/' + op, 'POST')); refresh(); }
      |async function rollback(id){ show(await call('/config/rollback/' + id, 'POST')); refresh(); }
      |async function act(kind){
      |  show(await call('/config/' + kind, 'POST', $('cfg').value)); refresh(); }
      |// --- draft-to-apply flow: the textarea IS the draft scratchpad ---
      |async function loadDraft(){
      |  const r = await call('/configuration/draft');
      |  if (r.code === 200 && r.body.yaml !== undefined) $('cfg').value = r.body.yaml;
      |  show(r.code === 204 ? {code: 200, body: {draft: 'none saved yet'}} : r);
      |}
      |async function saveDraft(){
      |  show(await call('/configuration/draft', 'PUT', $('cfg').value)); }
      |// positional LCS line diff — duplicates and reorderings report
      |// correctly (a Set-based diff collapsed repeated YAML lines like
      |// '- type: sql', hiding a duplicated stanza from the pre-apply check)
      |function lineDiff(a, b){
      |  const n = a.length, m = b.length;
      |  const dp = Array.from({length: n + 1}, () => new Array(m + 1).fill(0));
      |  for (let i = n - 1; i >= 0; i--) for (let j = m - 1; j >= 0; j--)
      |    dp[i][j] = a[i] === b[j] ? dp[i+1][j+1] + 1
      |                             : Math.max(dp[i+1][j], dp[i][j+1]);
      |  const out = []; let i = 0, j = 0;
      |  while (i < n && j < m) {
      |    if (a[i] === b[j]) { i++; j++; }
      |    else if (dp[i+1][j] >= dp[i][j+1]) out.push('- ' + a[i++]);
      |    else out.push('+ ' + b[j++]);
      |  }
      |  while (i < n) out.push('- ' + a[i++]);
      |  while (j < m) out.push('+ ' + b[j++]);
      |  return out;
      |}
      |async function diffActive(){
      |  const a = await call('/configuration');
      |  if (a.code !== 200) return show(a);
      |  const cur = (a.body.yaml || '').split('\n'), d = $('cfg').value.split('\n');
      |  show({code: 200, body: {active_version: a.body.version,
      |    changed: $('cfg').value !== a.body.yaml,
      |    diff: lineDiff(cur, d)}});
      |}
      |function row(tbl, cells){
      |  const tr = document.createElement('tr');
      |  cells.forEach(c => { const td = document.createElement('td');
      |    if (c instanceof Node) td.appendChild(c); else td.textContent = c;
      |    tr.appendChild(td); });
      |  tbl.appendChild(tr);
      |}
      |function btn(label, fn){ const b = document.createElement('button');
      |  b.textContent = label; b.onclick = fn; return b; }
      |// --- live event tail over /events/stream (SSE via streaming fetch:
      |// EventSource cannot carry the Authorization header). Falls back to
      |// the /events poll inside refresh() whenever the stream is down. ---
      |let sseLive = false, lastEv = 0;
      |function evRow(e){
      |  const et = $('events');
      |  const tr = document.createElement('tr');
      |  [new Date(e.occurred_at_ms).toISOString(), e.event_type,
      |   e.stream_id || '', e.message].forEach(c => {
      |    const td = document.createElement('td'); td.textContent = c;
      |    tr.appendChild(td); });
      |  et.insertBefore(tr, et.rows[1] || null);
      |  while (et.rows.length > 11) et.deleteRow(11);
      |}
      |async function tail(){
      |  try {
      |    const r = await fetch('/events/stream?last_id=' + lastEv, {headers: hdrs()});
      |    if (!r.ok || !r.body) throw new Error('HTTP ' + r.status);
      |    sseLive = true; $('evmode').textContent = 'live';
      |    const rd = r.body.getReader(); const dec = new TextDecoder();
      |    let buf = '';
      |    for (;;) {
      |      const {done, value} = await rd.read();
      |      if (done) break;
      |      buf += dec.decode(value, {stream: true});
      |      let i;
      |      while ((i = buf.indexOf('\n\n')) >= 0) {
      |        const frame = buf.slice(0, i); buf = buf.slice(i + 2);
      |        const idm = frame.match(/^id: (\d+)$/m);
      |        if (idm) lastEv = Number(idm[1]);
      |        const dm = frame.match(/^data: (.*)$/m);
      |        if (dm) try { evRow(JSON.parse(dm[1])); } catch (e) {}
      |      }
      |    }
      |    setTimeout(tail, 200); // server windows the connection; resume
      |  } catch (e) {
      |    sseLive = false; $('evmode').textContent = 'polling';
      |    setTimeout(tail, 5000);
      |  }
      |}
      |async function refresh(){
      |  try {
      |    const sys = await call('/system');
      |    $('sys').textContent = sys.code === 200
      |      ? 'spark ' + sys.body.sparkVersion + ' · ' + sys.body.activeStreams + ' active'
      |      : 'HTTP ' + sys.code;
      |    const st0 = await call('/status');
      |    if (st0.code === 200) {
      |      const b = st0.body, up = b.uptime_seconds;
      |      const dur = up >= 3600 ? Math.floor(up / 3600) + 'h' +
      |        Math.floor(up % 3600 / 60) + 'm' : Math.floor(up / 60) + 'm' + up % 60 + 's';
      |      $('status').innerHTML = '';
      |      const span = document.createElement('span');
      |      span.className = b.state === 'running' ? '' : 'down';
      |      span.textContent = b.state + ' · up ' + dur + ' · streams ' +
      |        b.streams_running + ' running / ' + b.streams_failed + ' failed / ' +
      |        b.streams_total + ' total · v' + b.version;
      |      $('status').appendChild(span);
      |    }
      |    const st = await call('/streams');
      |    const tbl = $('streams');
      |    while (tbl.rows.length > 1) tbl.deleteRow(1);
      |    (Array.isArray(st.body) ? st.body : []).forEach(s => {
      |      const acts = document.createElement('span');
      |      acts.appendChild(btn('stop', () => lifecycle(s.name || s.id, 'stop')));
      |      acts.appendChild(btn('restart', () => lifecycle(s.name || s.id, 'restart')));
      |      row(tbl, [s.name || '', s.id, String(s.isActive), s.pipeline || '', acts]);
      |    });
      |    if (!sseLive) { // poll fallback only — the SSE tail owns the table otherwise
      |      const ev = await call('/events');
      |      const et = $('events');
      |      while (et.rows.length > 1) et.deleteRow(1);
      |      const items = (ev.body && ev.body.items) || [];
      |      // advance the SSE cursor past what the poll rendered, so a
      |      // recovering tail resumes AFTER these rows instead of
      |      // replaying them as duplicates
      |      items.forEach(e => { if (e.id > lastEv) lastEv = e.id; });
      |      items.slice(0, 10).forEach(e =>
      |        row(et, [new Date(e.occurred_at_ms).toISOString(), e.event_type,
      |          e.stream_id || '', e.message]));
      |    }
      |    const au = await call('/audit');
      |    const at = $('audit');
      |    while (at.rows.length > 1) at.deleteRow(1);
      |    ((au.body && au.body.items) || []).slice(0, 10).forEach(a =>
      |      row(at, [new Date(a.occurred_at_ms).toISOString(), a.actor,
      |        a.resource_id, a.operation, a.state, a.detail]));
      |    const co = await call('/components');
      |    const ct = $('components');
      |    if (ct.rows.length === 1 && Array.isArray(co.body)) {
      |      const byKind = {};
      |      co.body.forEach(c => (byKind[c.kind] = byKind[c.kind] || []).push(c.name));
      |      Object.keys(byKind).sort().forEach(k => row(ct, [k, byKind[k].join(', ')]));
      |    }
      |    const vs = await call('/config/versions');
      |    const vt = $('versions');
      |    while (vt.rows.length > 1) vt.deleteRow(1);
      |    (Array.isArray(vs.body) ? vs.body : []).forEach(v =>
      |      row(vt, [v.id, new Date(v.created_ms).toISOString(), String(v.bytes),
      |        v.active ? 'ACTIVE' : '', btn('rollback', () => rollback(v.id))]));
      |  } catch (e) { $('msg').textContent = String(e); $('msg').className = 'err'; }
      |}
      |refresh(); setInterval(refresh, 3000); tail();
      |</script></body></html>
      |""".stripMargin
}
