package graft.streaming

/** Embedded operator console (reference `console/` — a React SPA over
  * the server API; arkflow-server serves it beside the JSON routes).
  * Spark-side equivalent: ONE self-contained HTML page over the same
  * [[ControlPlane]] JSON API — no build step, no external assets (the
  * deployment target is zero-egress clusters), no framework. It covers
  * the operator loop the reference console exists for: watch streams,
  * stop/start/restart them, validate + apply a config, inspect and roll
  * back versions. Everything else (task-level drill-down, metrics
  * timelines) is Structured Streaming's own Spark UI's job.
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
      |  .ok{color:#9c9} .badge{color:#8ab4f8}
      |</style></head><body>
      |<h1>graft console <span id="sys" class="badge"></span></h1>
      |<div>token <input id="tok" size="24" placeholder="bearer token (if set)">
      |  <button onclick="saveTok()">save</button></div>
      |<h2>streams</h2>
      |<table id="streams"><tr><th>name</th><th>id</th><th>active</th>
      |  <th>pipeline</th><th>actions</th></tr></table>
      |<h2>recent events</h2>
      |<table id="events"><tr><th>time</th><th>type</th><th>stream</th>
      |  <th>message</th></tr></table>
      |<h2>components</h2>
      |<table id="components"><tr><th>kind</th><th>registered</th></tr></table>
      |<h2>config versions</h2>
      |<table id="versions"><tr><th>id</th><th>created</th><th>bytes</th>
      |  <th>active</th><th>actions</th></tr></table>
      |<h2>config</h2>
      |<textarea id="cfg" placeholder="streams: ..."></textarea><br>
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
      |function row(tbl, cells){
      |  const tr = document.createElement('tr');
      |  cells.forEach(c => { const td = document.createElement('td');
      |    if (c instanceof Node) td.appendChild(c); else td.textContent = c;
      |    tr.appendChild(td); });
      |  tbl.appendChild(tr);
      |}
      |function btn(label, fn){ const b = document.createElement('button');
      |  b.textContent = label; b.onclick = fn; return b; }
      |async function refresh(){
      |  try {
      |    const sys = await call('/system');
      |    $('sys').textContent = sys.code === 200
      |      ? 'spark ' + sys.body.sparkVersion + ' · ' + sys.body.activeStreams + ' active'
      |      : 'HTTP ' + sys.code;
      |    const st = await call('/streams');
      |    const tbl = $('streams');
      |    while (tbl.rows.length > 1) tbl.deleteRow(1);
      |    (Array.isArray(st.body) ? st.body : []).forEach(s => {
      |      const acts = document.createElement('span');
      |      acts.appendChild(btn('stop', () => lifecycle(s.name || s.id, 'stop')));
      |      acts.appendChild(btn('restart', () => lifecycle(s.name || s.id, 'restart')));
      |      row(tbl, [s.name || '', s.id, String(s.isActive), s.pipeline || '', acts]);
      |    });
      |    const ev = await call('/events');
      |    const et = $('events');
      |    while (et.rows.length > 1) et.deleteRow(1);
      |    ((ev.body && ev.body.items) || []).slice(0, 10).forEach(e =>
      |      row(et, [new Date(e.occurred_at_ms).toISOString(), e.event_type,
      |        e.stream_id || '', e.message]));
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
      |refresh(); setInterval(refresh, 3000);
      |</script></body></html>
      |""".stripMargin
}
