"""Server-rendered HTML frontend — the role of the reference's React SPA
(`/root/reference/@web/frontend/src/`): landing page with hero / feature grid
/ testimonials / footer CTA (`pages/LandingPage.jsx`,
`components/{HeroSection,FeaturesGrid,TestimonialsCarousel,FooterCTA}.jsx`),
auth pages (`auth/{LoginPage,RegisterPage}.jsx`), download page
(`pages/DownloadPage.jsx`), and the admin dashboard with summary cards +
charts + tables (`pages/admin/{AdminDashboard,SummaryCards,SurveysChart,
BugReportsTable,ReviewsTable}.jsx`, `pages/admin/AdminUsersPage.jsx`).

TPU-rebuild design: instead of a React/Redux bundle, each page is a static
HTML shell served by the same WSGI app; dynamic data is fetched client-side
from the identical JSON API with ~40 lines of vanilla JS (the Redux slices'
role — `features/admin/*Slice.js` — collapses to `fetch` + render helpers),
and the admin charts are client-built inline SVG bars (recharts role). Auth
mirrors the SPA: the token from /api/v1/login is kept in localStorage and
sent as a Bearer header (`api/axios.js:8-17`); page shells themselves are
public exactly like the served JS bundle is.
"""

from __future__ import annotations

from typing import Optional

# -- shared shell -----------------------------------------------------------

_CSS = """
:root { --ink:#1a1a2e; --mut:#5b5b73; --acc:#4f46e5; --bg:#f7f7fb; --card:#fff; }
* { box-sizing:border-box; margin:0; }
body { font-family:system-ui,sans-serif; color:var(--ink); background:var(--bg); }
nav { display:flex; gap:1.2rem; align-items:center; padding:.8rem 2rem;
      background:var(--card); box-shadow:0 1px 4px rgba(0,0,0,.08); }
nav a { color:var(--ink); text-decoration:none; font-weight:500; }
nav a.brand { color:var(--acc); font-weight:700; margin-right:auto; }
main { max-width:64rem; margin:0 auto; padding:2rem; }
.hero { text-align:center; padding:3rem 0 2rem; }
.hero h1 { font-size:2.6rem; letter-spacing:-.02em; }
.hero p { color:var(--mut); margin-top:1rem; font-size:1.1rem; }
.grid { display:grid; grid-template-columns:repeat(auto-fit,minmax(14rem,1fr));
        gap:1rem; margin:2rem 0; }
.card { background:var(--card); border-radius:.6rem; padding:1.2rem;
        box-shadow:0 1px 4px rgba(0,0,0,.07); }
.card h3 { margin-bottom:.5rem; }
.card p { color:var(--mut); font-size:.95rem; }
.stat { font-size:1.8rem; font-weight:700; color:var(--acc); }
.btn { display:inline-block; background:var(--acc); color:#fff; border:none;
       padding:.6rem 1.4rem; border-radius:.4rem; font-size:1rem;
       text-decoration:none; cursor:pointer; }
form.auth { max-width:22rem; margin:2rem auto; display:flex;
            flex-direction:column; gap:.8rem; }
form.auth input, form.auth textarea, form.auth select {
  padding:.55rem; border:1px solid #d6d6e3; border-radius:.4rem; font:inherit; }
table { width:100%; border-collapse:collapse; background:var(--card);
        border-radius:.6rem; overflow:hidden; }
th, td { text-align:left; padding:.5rem .8rem; border-bottom:1px solid #ececf4;
         font-size:.92rem; }
th { background:#efeffa; }
.msg { color:var(--acc); min-height:1.2em; }
footer { text-align:center; color:var(--mut); padding:2rem; font-size:.9rem; }
"""

_NAV = """
<nav>
  <a class="brand" href="/">NU Scaler</a>
  <a href="/download">Download</a>
  <a href="/admin">Admin</a>
  <a href="/login" id="nav-auth">Log in</a>
</nav>
<script>
  if (localStorage.getItem('token')) {
    const a = document.getElementById('nav-auth');
    a.textContent = 'Log out';
    a.href = '#';
    a.onclick = async () => {
      await api('/api/v1/logout', {method:'POST'});
      localStorage.removeItem('token'); location.href = '/';
    };
  }
</script>
"""

# the axios wrapper role (`api/axios.js`): JSON + Bearer token from storage
_JS = """
async function api(path, opts = {}) {
  const headers = {'Content-Type': 'application/json'};
  const t = localStorage.getItem('token');
  if (t) headers['Authorization'] = 'Bearer ' + t;
  const r = await fetch(path, {headers, ...opts});
  return {status: r.status, body: await r.json()};
}
function el(tag, text) {
  const e = document.createElement(tag);
  if (text !== undefined) e.textContent = text;
  return e;
}
function barChart(svgId, pairs, color) {
  const svg = document.getElementById(svgId);
  const W = 360, H = 140, pad = 22, n = pairs.length || 1;
  const max = Math.max(1, ...pairs.map(p => p[1]));
  svg.setAttribute('viewBox', `0 0 ${W} ${H + 18}`);
  pairs.forEach(([k, v], i) => {
    const bw = (W - pad) / n, h = v / max * (H - pad);
    const r = document.createElementNS('http://www.w3.org/2000/svg', 'rect');
    r.setAttribute('x', pad + i * bw + 2); r.setAttribute('y', H - h);
    r.setAttribute('width', Math.max(bw - 6, 2)); r.setAttribute('height', h);
    r.setAttribute('fill', color); r.setAttribute('rx', 2); svg.appendChild(r);
    const t = document.createElementNS('http://www.w3.org/2000/svg', 'text');
    t.setAttribute('x', pad + i * bw + bw / 2); t.setAttribute('y', H + 12);
    t.setAttribute('text-anchor', 'middle'); t.setAttribute('font-size', '9');
    t.textContent = `${k} (${v})`; svg.appendChild(t);
  });
}
"""


def _page(title: str, body: str, extra_js: str = "") -> str:
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<meta name='viewport' content='width=device-width,initial-scale=1'>"
        f"<title>{title}</title><style>{_CSS}</style>"
        f"<script>{_JS}</script></head><body>{_NAV}<main>{body}</main>"
        "<footer>NU Scaler — TPU-native real-time upscaling &amp; frame "
        "interpolation.</footer>"
        f"<script>{extra_js}</script></body></html>"
    )


# -- pages ------------------------------------------------------------------

def landing(stats: dict) -> str:
    """`pages/LandingPage.jsx`: hero + features grid (`data/features.js`) +
    live public stats + testimonials + footer CTA."""
    features = [
        ("Ultra HD output", "Upscale frames up to 4× with MXU-fused Lanczos, "
         "FSR EASU/RCAS, or the learned quality tier — gated at ≥50 dB PSNR."),
        ("Motion-compensated interpolation", "Gather-free block-MC optical "
         "flow doubles frame rate with real motion, not cross-fades."),
        ("Multi-platform", "Linux/X11 capture today; synthetic, video and "
         "file sources everywhere; CLI, GUI and headless APIs."),
    ]
    cards = "".join(
        f"<div class='card'><h3>{t}</h3><p>{d}</p></div>" for t, d in features
    )
    stat_cards = "".join(
        f"<div class='card'><div class='stat'>{v}</div><p>{k}</p></div>"
        for k, v in (
            ("downloads", stats.get("downloads", 0)),
            ("reviews", stats.get("reviews", 0)),
            ("average rating", stats.get("average_rating", 0.0)),
        )
    )
    body = f"""
<div class="hero">
  <h1>NU Scaler: real-time AI upscaling</h1>
  <p>Turn low-resolution frames into crisp high-resolution video with a
     TPU-native upscaling and frame-interpolation engine.</p>
  <p style="margin-top:1.4rem"><a class="btn" href="/download">Download</a></p>
</div>
<div class="grid">{cards}</div>
<h2>By the numbers</h2>
<div class="grid">{stat_cards}</div>
<h2>Leave a review</h2>
<form class="auth" id="review-form">
  <select id="rv-rating">{''.join(f'<option value="{i}">{i} star{"s" * (i > 1)}</option>' for i in range(5, 0, -1))}</select>
  <textarea id="rv-comment" rows="3" placeholder="What do you think?"></textarea>
  <button class="btn" type="submit">Submit review</button>
  <div class="msg" id="rv-msg"></div>
</form>
"""
    js = """
document.getElementById('review-form').onsubmit = async (e) => {
  e.preventDefault();
  const r = await api('/api/v1/feedback/reviews', {method:'POST', body: JSON.stringify({
    rating: parseInt(document.getElementById('rv-rating').value),
    comment: document.getElementById('rv-comment').value})});
  document.getElementById('rv-msg').textContent =
    r.status === 201 ? r.body.message : JSON.stringify(r.body.errors || r.body.message);
};
"""
    return _page("NU Scaler", body, js)


def auth_page(kind: str) -> str:
    """`auth/LoginPage.jsx` / `auth/RegisterPage.jsx` (shared `AuthForm.jsx`):
    posts to the API, stores the Sanctum-role token in localStorage."""
    is_reg = kind == "register"
    title = "Create an account" if is_reg else "Welcome back"
    name_field = '<input id="au-name" placeholder="Name">' if is_reg else ""
    other = (
        '<a href="/login">Already have an account? Log in</a>'
        if is_reg else '<a href="/register">New here? Register</a>'
    )
    body = f"""
<div class="hero"><h1>{title}</h1></div>
<form class="auth" id="auth-form">
  {name_field}
  <input id="au-email" type="email" placeholder="Email">
  <input id="au-password" type="password" placeholder="Password">
  <button class="btn" type="submit">{'Register' if is_reg else 'Log in'}</button>
  <div class="msg" id="au-msg"></div>
  {other}
</form>
"""
    endpoint = "/api/v1/auth/register" if is_reg else "/api/v1/login"
    payload = (
        "{name: document.getElementById('au-name').value, email, password}"
        if is_reg else "{email, password}"
    )
    js = f"""
document.getElementById('auth-form').onsubmit = async (e) => {{
  e.preventDefault();
  const email = document.getElementById('au-email').value;
  const password = document.getElementById('au-password').value;
  const r = await api('{endpoint}', {{method:'POST', body: JSON.stringify({payload})}});
  if (r.body.token) {{
    localStorage.setItem('token', r.body.token); location.href = '/download';
  }} else {{
    document.getElementById('au-msg').textContent =
      JSON.stringify(r.body.errors || r.body.message);
  }}
}};
"""
    return _page(f"NU Scaler — {kind}", body, js)


def download_page() -> str:
    """`pages/DownloadPage.jsx`: per-platform download cards driven by
    /api/v1/download/public; the download click hits the logged endpoint."""
    body = """
<div class="hero"><h1>Download NU Scaler</h1>
  <p>Pick your platform. Downloads are logged for the release dashboard.</p></div>
<div class="grid" id="dl-grid"></div>
<div class="msg" id="dl-msg"></div>
"""
    js = """
(async () => {
  const r = await api('/api/v1/download/public');
  const grid = document.getElementById('dl-grid');
  for (const link of r.body.data) {
    const c = el('div'); c.className = 'card';
    c.appendChild(el('h3', link.platform));
    c.appendChild(el('p', link.filename + ' — v' + link.version));
    const b = el('button', 'Download'); b.className = 'btn';
    b.onclick = async () => {
      const d = await api(link.url);
      document.getElementById('dl-msg').textContent =
        d.status === 200 ? d.body.message + ': ' + d.body.data.filename
                         : JSON.stringify(d.body.message);
    };
    c.appendChild(b); grid.appendChild(c);
  }
})();
"""
    return _page("NU Scaler — download", body, js)


def admin_dashboard() -> str:
    """`pages/admin/AdminDashboard.jsx`: summary cards (`SummaryCards.jsx`),
    bug-severity + downloads-by-platform bar charts (`SurveysChart.jsx`
    recharts role as inline SVG), and the latest benchmark reports table."""
    body = """
<div class="hero"><h1>Admin dashboard</h1></div>
<div class="grid" id="cards"></div>
<div class="grid">
  <div class="card"><h3>Bug reports by severity</h3><svg id="sev-chart"></svg></div>
  <div class="card"><h3>Downloads by platform</h3><svg id="plat-chart"></svg></div>
</div>
<h2>Benchmark reports</h2>
<table id="bench-table"><thead><tr>
  <th>metric</th><th>value</th><th>unit</th><th>vs baseline</th>
</tr></thead><tbody></tbody></table>
<div class="msg" id="ad-msg"></div>
"""
    js = """
(async () => {
  const r = await api('/api/admin/metrics/dashboard');
  if (r.status !== 200) {
    document.getElementById('ad-msg').textContent =
      r.body.message + ' — log in as an admin to view this page.';
    return;
  }
  const d = r.body.data, cards = document.getElementById('cards');
  for (const [label, v] of [
      ['users', d.users.total], ['reviews', d.reviews.total],
      ['avg rating', d.reviews.average_rating],
      ['bug reports', d.bug_reports.total],
      ['hardware surveys', d.hardware_surveys.total],
      ['downloads', d.downloads.total],
      ['benchmarks', d.benchmarks.total],
      ['best fps', d.benchmarks.best_fps ?? '—']]) {
    const c = el('div'); c.className = 'card';
    const s = el('div', String(v)); s.className = 'stat';
    c.appendChild(s); c.appendChild(el('p', label)); cards.appendChild(c);
  }
  barChart('sev-chart', Object.entries(d.bug_reports.by_severity), '#e1575a');
  barChart('plat-chart', Object.entries(d.downloads.by_platform), '#4f46e5');
  const b = await api('/api/admin/benchmarks');
  const tb = document.querySelector('#bench-table tbody');
  for (const row of (b.body.data || []).slice(-20).reverse()) {
    const p = row.payload || {}, tr = el('tr');
    for (const v of [p.metric, p.value, p.unit, p.vs_baseline ?? '—'])
      tr.appendChild(el('td', String(v)));
    tb.appendChild(tr);
  }
})();
"""
    return _page("NU Scaler — admin", body, js)


def admin_users() -> str:
    """`pages/admin/AdminUsersPage.jsx`: user table with role management
    (PATCH /api/admin/users/{id}/role)."""
    body = """
<div class="hero"><h1>Users</h1></div>
<table id="users-table"><thead><tr>
  <th>id</th><th>name</th><th>email</th><th>role</th><th></th>
</tr></thead><tbody></tbody></table>
<div class="msg" id="us-msg"></div>
"""
    js = """
async function loadUsers() {
  const r = await api('/api/admin/users');
  if (r.status !== 200) {
    document.getElementById('us-msg').textContent = r.body.message;
    return;
  }
  const tb = document.querySelector('#users-table tbody');
  tb.replaceChildren();
  for (const u of r.body.data) {
    const tr = el('tr');
    for (const v of [u.id, u.name, u.email, u.role]) tr.appendChild(el('td', String(v)));
    const td = el('td');
    const b = el('button', u.role === 'admin' ? 'demote' : 'promote');
    b.className = 'btn';
    b.onclick = async () => {
      await api(`/api/admin/users/${u.id}/role`, {method: 'PATCH',
        body: JSON.stringify({role: u.role === 'admin' ? 'user' : 'admin'})});
      loadUsers();
    };
    td.appendChild(b); tr.appendChild(td); tb.appendChild(tr);
  }
}
loadUsers();
"""
    return _page("NU Scaler — users", body, js)


def render(path: str, stats: Optional[dict] = None) -> Optional[str]:
    """Route a GET path to its page HTML, or None if it isn't a page route
    (`router/routes.jsx` route table)."""
    if path == "/":
        return landing(stats or {})
    if path == "/login":
        return auth_page("login")
    if path == "/register":
        return auth_page("register")
    if path == "/download":
        return download_page()
    if path == "/admin":
        return admin_dashboard()
    if path == "/admin/users":
        return admin_users()
    return None
