"""Embedded static view — the engine's parity for the reference's
bundled React app + GraphQL GUI (reference: src/cli/server/view.rs:12-37
``get_view_file``, src/cli/server/build_view.rs:17-51 build-time
embedding, src/cli/server.rs:88-116 routing: ``GET /`` → index.html,
``GET /robots.txt``, ``GET /view/*`` → static assets, ``GET
/api/graphql`` → graphql-gui.html).

The reference embeds a compiled React bundle at build time; here the
files are small self-contained vanilla-JS pages (no CDN, no build step —
the container has no node toolchain and the serving contract, not the
widget framework, is the parity surface): a model browser driven by
GraphQL introspection and a query console POSTing to /api/graphql.
"""

from __future__ import annotations

_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>gus_spark</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:70rem}
 table{border-collapse:collapse;margin-top:1rem}
 td,th{border:1px solid #ccc;padding:.3rem .6rem;text-align:left}
 button{margin:.2rem;padding:.3rem .8rem;cursor:pointer}
 a{color:#06c}
</style></head><body>
<h1>gus_spark</h1>
<p>Model browser — <a href="/api/graphql">GraphQL console</a></p>
<div id="models"></div><div id="rows"></div>
<script>
const gql = q => fetch('/api/graphql',{method:'POST',
  headers:{'content-type':'application/json'},
  body:JSON.stringify({query:q})}).then(r=>r.json());
const lower1 = s => s[0].toLowerCase()+s.slice(1);
gql('{ __schema { queryType { fields { name } } } }').then(res=>{
  const fields = res.data.__schema.queryType.fields.map(f=>f.name)
    .filter(n=>!n.startsWith('readOne'));
  const div = document.getElementById('models');
  fields.forEach(name=>{
    const b = document.createElement('button');
    b.textContent = name;
    b.onclick = () => show(name);
    div.appendChild(b);
  });
});
async function show(plural){
  const t = await gql(`{ __schema { queryType { fields { name type
    { ofType { ofType { name fields { name } } } } } } }`);
  const field = t.data.__schema.queryType.fields
    .find(f=>f.name===plural);
  const cols = field.type.ofType.ofType.fields.map(f=>f.name);
  const res = await gql(`{ ${plural}(limit: 50) { ${cols.join(' ')} } }`);
  const rows = res.data ? res.data[plural] : [];
  const h = ['<table><tr>', ...cols.map(c=>`<th>${c}</th>`), '</tr>'];
  rows.forEach(r=>{
    h.push('<tr>', ...cols.map(c=>`<td>${JSON.stringify(r[c])}</td>`),
           '</tr>');
  });
  h.push('</table>');
  document.getElementById('rows').innerHTML = h.join('');
}
</script></body></html>
"""

_GRAPHQL_GUI_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>GraphQL console</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:70rem}
 textarea{width:100%;height:12rem;font-family:monospace}
 pre{background:#f6f6f6;padding:1rem;overflow:auto}
 button{padding:.4rem 1rem;cursor:pointer}
</style></head><body>
<h1>GraphQL console</h1>
<p><a href="/">back to model browser</a></p>
<textarea id="q">{ __schema { types { name } } }</textarea><br>
<button onclick="run()">Run</button>
<pre id="out"></pre>
<script>
async function run(){
  const res = await fetch('/api/graphql',{method:'POST',
    headers:{'content-type':'application/json'},
    body:JSON.stringify({query:document.getElementById('q').value})});
  document.getElementById('out').textContent =
    JSON.stringify(await res.json(), null, 2);
}
</script></body></html>
"""

_ROBOTS_TXT = "User-agent: *\nDisallow: /api/\n"

# uri segments -> (body, content-type); mirrors view.rs's embedded map
_VIEW_FILES: dict[str, tuple[str, str]] = {
    "index.html": (_INDEX_HTML, "text/html; charset=utf-8"),
    "graphql-gui.html": (_GRAPHQL_GUI_HTML, "text/html; charset=utf-8"),
    "robots.txt": (_ROBOTS_TXT, "text/plain; charset=utf-8"),
}


def get_view_file(uri: str) -> tuple[bytes, str] | None:
    """Resolve a request path to an embedded view file (server.rs
    routing): ``/`` → index.html, ``/robots.txt``, ``/view/<file>``,
    ``GET /api/graphql`` → the query console. None → fall through to
    the JSON API handler."""
    path = uri.split("?", 1)[0].strip("/")
    name = None
    if path == "":
        name = "index.html"
    elif path == "robots.txt":
        name = "robots.txt"
    elif path == "api/graphql":
        name = "graphql-gui.html"
    elif path.startswith("view/"):
        name = path[len("view/"):]
    if name is None:
        return None
    entry = _VIEW_FILES.get(name)
    if entry is None:
        return None
    body, content_type = entry
    return body.encode("utf-8"), content_type
