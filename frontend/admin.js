/* Magic Master TPU — admin SPA: stats, user management (edit/bulk/
   subscription), transactions, news, email campaigns, runtime settings
   editor, prompt versioning, reports, audit log, diagnostics.
   API: amw_tpu/runtime/admin_routes.py (reference: frontend/admin.html). */
"use strict";

mmHeader("/admin");

/* ---------- tabs ---------- */
const tabs = $("tabs");
tabs.querySelectorAll("button").forEach((b) => {
  b.onclick = () => {
    tabs.querySelectorAll("button").forEach((x) => x.classList.remove("active"));
    b.classList.add("active");
    document.querySelectorAll(".tab-pane").forEach((p) => p.classList.add("hidden"));
    $("pane-" + b.dataset.tab).classList.remove("hidden");
    LOADERS[b.dataset.tab] && LOADERS[b.dataset.tab]();
  };
});

function guard(e) {
  if (String(e.message).startsWith("401") || String(e.message).startsWith("403") ||
      /admin/i.test(e.message)) {
    msg("Admin sign-in required");
    location.href = "/login?next=/admin";
  } else msg("Error: " + e.message, 8000);
}

/* ---------- stats ---------- */
async function loadStats() {
  try {
    const s = await jget("/api/admin/stats");
    const cells = [
      ["Users", s.users_total, `+${s.users_24h} / 24h`],
      ["Masterings", s.masterings_total, `+${s.masterings_24h} / 24h`],
      ["Revenue", s.revenue_total, "total"],
      ["Jobs running", s.jobs_running, `${s.jobs_queued ?? 0} queued`],
      ["Errors 24h", s.job_errors_24h, "mastering jobs"],
      ["Version", s.version, "backend"],
    ];
    $("stat-grid").innerHTML = cells.map(([k, v, sub]) =>
      `<div class="stat"><b>${esc(v ?? "—")}</b><span>${esc(k)} · ${esc(sub)}</span></div>`).join("");
    $("tier-row").innerHTML = Object.entries(s.users_by_tier || {}).map(
      ([t, n]) => `<span class="pill">${esc(t)}: ${n}</span>`).join("");
  } catch (e) { guard(e); }
}

/* ---------- users ---------- */
let uOffset = 0, uTotal = 0, uSelected = new Set(), uCurrent = null;

async function loadUsers() {
  try {
    const q = encodeURIComponent($("u-q").value.trim());
    const d = await jget(`/api/admin/users?limit=25&offset=${uOffset}&q=${q}`);
    uTotal = d.total;
    const t = $("u-table");
    t.innerHTML =
      "<tr><th></th><th>id</th><th>email</th><th>tier</th><th>tokens</th>" +
      "<th>sub until</th><th>flags</th><th>created</th><th></th></tr>" +
      d.items.map((u) => `<tr>
        <td><input type="checkbox" data-sel="${u.id}" ${uSelected.has(u.id) ? "checked" : ""}></td>
        <td>${u.id}</td><td>${esc(u.email)}</td>
        <td><span class="pill ${u.tier !== "free" ? "acc" : ""}">${esc(u.tier)}</span></td>
        <td>${u.tokens}</td><td>${fmtDate(u.subscription_until)}</td>
        <td>${u.is_admin ? "👑" : ""}${u.is_blocked ? "⛔" : ""}</td>
        <td>${fmtDate(u.created_at)}</td>
        <td><button class="sec small" data-edit="${u.id}">edit</button></td></tr>`).join("");
    $("u-page").textContent = `${uOffset + 1}–${Math.min(uOffset + 25, uTotal)} of ${uTotal}`;
    t.querySelectorAll("[data-sel]").forEach((el) => {
      el.onchange = () => el.checked ? uSelected.add(+el.dataset.sel)
        : uSelected.delete(+el.dataset.sel);
    });
    t.querySelectorAll("[data-edit]").forEach((el) => {
      el.onclick = () => openUser(+el.dataset.edit);
    });
  } catch (e) { guard(e); }
}

$("u-csv").onclick = () =>
  downloadAuth("/api/admin/users/export.csv", "users.csv").catch(guard);
$("u-search").onclick = () => { uOffset = 0; loadUsers(); };
$("u-q").addEventListener("keydown", (e) => { if (e.key === "Enter") { uOffset = 0; loadUsers(); } });
$("u-prev").onclick = () => { uOffset = Math.max(0, uOffset - 25); loadUsers(); };
$("u-next").onclick = () => { if (uOffset + 25 < uTotal) { uOffset += 25; loadUsers(); } };

$("u-bulk-go").onclick = async () => {
  const action = $("u-bulk-action").value;
  if (!action || !uSelected.size) return msg("Pick an action and some users");
  try {
    const body = { action, user_ids: [...uSelected] };
    if (action === "add_tokens") body.tokens = 10;
    if (action === "set_tier") body.tier = "pro";
    await jpost("/api/admin/users/bulk-action", body);
    uSelected.clear();
    msg("Done");
    loadUsers();
  } catch (e) { guard(e); }
};

async function openUser(id) {
  try {
    const u = await jget(`/api/admin/users/${id}`);
    uCurrent = u;
    $("ud-title").textContent = `#${u.id} ${u.email}`;
    $("ud-tier").value = u.tier || "free";
    $("ud-tokens").value = u.tokens ?? 0;
    $("ud-blocked").checked = !!u.is_blocked;
    $("ud-admin").checked = !!u.is_admin;
    const st = u.stats || {};
    $("ud-stats").textContent =
      `${st.masterings_total ?? 0} masterings · registered ${fmtDate(u.created_at)}` +
      ` · last login ${fmtDate(u.last_login_at) || "never"}`;
    $("user-dialog").showModal();
  } catch (e) { guard(e); }
}

$("ud-close").onclick = () => $("user-dialog").close();
$("ud-save").onclick = async () => {
  try {
    await jpatch(`/api/admin/users/${uCurrent.id}`, {
      tier: $("ud-tier").value,
      tokens: parseInt($("ud-tokens").value, 10) || 0,
      is_blocked: $("ud-blocked").checked,
      is_admin: $("ud-admin").checked,
    });
    $("user-dialog").close();
    msg("Saved");
    loadUsers();
  } catch (e) { guard(e); }
};
$("ud-sub").onclick = async () => {
  try {
    await jpost(`/api/admin/users/${uCurrent.id}/subscription`, {
      tier: $("ud-tier").value === "free" ? "pro" : $("ud-tier").value,
      days: parseInt($("ud-days").value, 10) || 30,
    });
    $("user-dialog").close();
    msg("Subscription granted");
    loadUsers();
  } catch (e) { guard(e); }
};
$("ud-delete").onclick = async () => {
  if (!confirm(`Delete user ${uCurrent.email}?`)) return;
  try {
    await jdelete(`/api/admin/users/${uCurrent.id}`);
    $("user-dialog").close();
    msg("Deleted");
    loadUsers();
  } catch (e) { guard(e); }
};

/* ---------- transactions ---------- */
async function loadTx() {
  try {
    const { items } = await jget("/api/admin/transactions");
    $("tx-table").innerHTML =
      "<tr><th>id</th><th>user</th><th>amount</th><th>status</th>" +
      "<th>plan</th><th>provider</th><th>date</th></tr>" +
      items.map((t) => `<tr><td>${t.id}</td><td>${t.user_id ?? ""}</td>
        <td>${t.amount} ${esc(t.currency || "")}</td>
        <td class="${t.status === "succeeded" ? "ok" : ""}">${esc(t.status)}</td>
        <td>${esc(t.plan || "")}</td><td>${esc(t.provider || "")}</td>
        <td>${fmtDate(t.created_at)}</td></tr>`).join("");
  } catch (e) { guard(e); }
}

$("tx-csv").onclick = () =>
  downloadAuth("/api/admin/transactions/export.csv", "transactions.csv")
    .catch(guard);
$("tx-new").onclick = async () => {
  const user_id = prompt("user id:");
  if (!user_id) return;
  const amount = prompt("amount:", "0");
  try {
    await jpost("/api/admin/transactions", {
      user_id: +user_id, amount: +amount, status: "succeeded",
      provider: "manual",
    });
    msg("Created");
    loadTx();
  } catch (e) { guard(e); }
};

/* ---------- news ---------- */
async function loadNews() {
  try {
    const { items } = await jget("/api/admin/news");
    $("n-table").innerHTML = "<tr><th>id</th><th>title</th><th>date</th><th></th></tr>" +
      items.map((n) => `<tr><td>${n.id}</td><td>${esc(n.title)}</td>
        <td>${fmtDate(n.created_at)}</td>
        <td><button class="danger small" data-del="${n.id}">✕</button></td></tr>`).join("");
    $("n-table").querySelectorAll("[data-del]").forEach((el) => {
      el.onclick = async () => {
        try { await jdelete(`/api/admin/news/${el.dataset.del}`); loadNews(); }
        catch (e) { guard(e); }
      };
    });
  } catch (e) { guard(e); }
}

$("n-create").onclick = async () => {
  try {
    await jpost("/api/admin/news", {
      title: $("n-title").value, body: $("n-body").value,
    });
    $("n-title").value = ""; $("n-body").value = "";
    msg("Published");
    loadNews();
  } catch (e) { guard(e); }
};

/* ---------- campaigns ---------- */
async function loadCampaigns() {
  try {
    const { items } = await jget("/api/admin/campaigns");
    $("c-table").innerHTML =
      "<tr><th>id</th><th>subject</th><th>audience</th><th>status</th><th></th></tr>" +
      items.map((c) => `<tr><td>${c.id}</td><td>${esc(c.subject)}</td>
        <td>${esc(c.audience || "all")}</td><td>${esc(c.status || "draft")}</td>
        <td><button class="sec small" data-send="${c.id}">send</button>
            <button class="sec small" data-cst="${c.id}">stats</button></td></tr>`).join("");
    $("c-table").querySelectorAll("[data-send]").forEach((el) => {
      el.onclick = async () => {
        try {
          const d = await jpost(`/api/admin/campaigns/${el.dataset.send}/send`);
          msg(`Queued: ${d.sent ?? d.queued ?? "ok"}`);
          loadCampaigns();
        } catch (e) { guard(e); }
      };
    });
    $("c-table").querySelectorAll("[data-cst]").forEach((el) => {
      el.onclick = async () => {
        try {
          const d = await jget(`/api/admin/campaigns/${el.dataset.cst}/stats`);
          $("c-stats-grid").innerHTML = [
            [d.status || "draft", T("Status")],
            [d.sent_count ?? 0, T("Emails sent")],
            [d.audience_total ?? 0, T("Current audience")],
            [(d.delivery_pct ?? 0) + "%", T("Delivery rate")],
          ].map(([v, k]) =>
            `<div class="stat"><b>${esc(v)}</b><span>${esc(k)}</span></div>`)
            .join("");
          $("c-stats-meta").textContent =
            `#${d.id} · ${d.subject} · ${fmtDate(d.created_at)}`;
          $("c-stats-card").classList.remove("hidden");
        } catch (e) { guard(e); }
      };
    });
  } catch (e) { guard(e); }
}

$("c-create").onclick = async () => {
  try {
    await jpost("/api/admin/campaigns", {
      subject: $("c-subject").value, body: $("c-body").value,
      audience: $("c-aud").value,
    });
    msg("Created");
    loadCampaigns();
  } catch (e) { guard(e); }
};

/* ---------- settings ---------- */
async function loadSettings() {
  try {
    const d = await jget("/api/admin/settings");
    $("s-table").innerHTML = "<tr><th>key</th><th>value</th><th></th></tr>" +
      Object.entries(d).map(([k, v]) => `<tr>
        <td class="mono">${esc(k)}${v.overridden ? ' <span class="pill acc">override</span>' : ""}</td>
        <td><input type="text" class="mono" data-set="${esc(k)}"
             value="${esc(v.value ?? "")}" style="width:100%"></td>
        <td><button class="sec small" data-apply="${esc(k)}">set</button></td></tr>`).join("");
    $("s-table").querySelectorAll("[data-apply]").forEach((el) => {
      el.onclick = async () => {
        const key = el.dataset.apply;
        const input = $("s-table").querySelector(`[data-set="${key}"]`);
        try {
          await jpatch("/api/admin/settings", { [key]: input.value });
          msg(`${key} updated`);
          loadSettings();
        } catch (e) { guard(e); }
      };
    });
  } catch (e) { guard(e); }
}

/* ---------- prompts ---------- */
async function loadPrompts() {
  try {
    const { items } = await jget("/api/admin/prompts");
    $("p-table").innerHTML =
      "<tr><th>slug</th><th>v</th><th>active</th><th>date</th><th></th></tr>" +
      items.map((p) => `<tr><td>${esc(p.name)}</td><td>${p.version}</td>
        <td>${p.active ? "✓" : ""}</td><td>${fmtDate(p.created_at)}</td>
        <td><button class="sec small" data-act="${esc(p.name)}:${p.version}">activate</button></td></tr>`).join("");
    $("p-table").querySelectorAll("[data-act]").forEach((el) => {
      el.onclick = async () => {
        const [slug, version] = el.dataset.act.split(":");
        try {
          await jpost(`/api/admin/prompts/${slug}/activate`, { version: +version });
          msg("Activated");
          loadPrompts();
        } catch (e) { guard(e); }
      };
    });
  } catch (e) { guard(e); }
}

$("p-save").onclick = async () => {
  try {
    await jpost("/api/admin/prompts", {
      name: $("p-name").value, template: $("p-text").value,
    });
    msg("Saved");
    loadPrompts();
  } catch (e) { guard(e); }
};
$("p-reset").onclick = async () => {
  try {
    await jpost(`/api/admin/prompts/${$("p-name").value}/reset`);
    msg("Reset to default");
    loadPrompts();
  } catch (e) { guard(e); }
};
$("p-history").onclick = async () => {
  try {
    const slug = $("p-name").value;
    const { items } = await jget(`/api/admin/prompts/${slug}/history`);
    // Version list rendered into the table with per-version viewers: click
    // a version to load its template text into the editor.
    $("p-table").innerHTML =
      "<tr><th>v</th><th>active</th><th>date</th><th></th></tr>" +
      items.map((i) => `<tr><td>v${i.version}</td>
        <td>${i.active ? "✓" : ""}</td><td>${fmtDate(i.created_at)}</td>
        <td><button class="sec small" data-view="${i.version}">view</button></td></tr>`).join("");
    $("p-table").querySelectorAll("[data-view]").forEach((el) => {
      el.onclick = async () => {
        try {
          const v = await jget(
            `/api/admin/prompts/${slug}/version/${el.dataset.view}`);
          $("p-text").value = v.template || "";
          msg(`Loaded v${v.version} into the editor`);
        } catch (e) { guard(e); }
      };
    });
  } catch (e) { guard(e); }
};

/* ---------- reports ---------- */
let lastReport = null;

async function loadReports() {
  try {
    const { reports } = await jget("/api/admin/reports/list");
    $("r-list").innerHTML = reports.map((r) =>
      `<button class="sec small" data-rep="${esc(r)}">${esc(r)}</button>`).join("");
    $("r-list").querySelectorAll("[data-rep]").forEach((el) => {
      el.onclick = async () => {
        try {
          const d = await jget(`/api/admin/reports/${el.dataset.rep}`);
          lastReport = el.dataset.rep;
          const rows = d.rows || d.items || [];
          if (!rows.length) {
            $("r-table").innerHTML = "<tr><td>empty</td></tr>";
            $("r-chart").classList.add("hidden");
            return;
          }
          const cols = Object.keys(rows[0]);
          renderReportChart(rows, cols);
          // the table stays as the accessible data view under the chart
          $("r-table").innerHTML =
            `<tr>${cols.map((c) => `<th>${esc(c)}</th>`).join("")}</tr>` +
            rows.map((r) => `<tr>${cols.map((c) => `<td>${esc(r[c])}</td>`).join("")}</tr>`).join("");
        } catch (e) { guard(e); }
      };
    });
  } catch (e) { guard(e); }
}

function renderReportChart(rows, cols) {
  // Daily-count reports come back as (d, n) pairs — render a single-series
  // bar chart (chronological), per-bar tooltip, table below as data view.
  const host = $("r-chart");
  if (!(cols.length === 2 && cols.includes("d") && cols.includes("n"))) {
    host.classList.add("hidden");
    return;
  }
  // SQL GROUP BY skips zero days: fill the gaps so bar spacing represents
  // the time axis truthfully (cap at 120 bars for pathological ranges).
  const byDay = {};
  for (const r of rows) byDay[r.d] = +r.n || 0;
  const days = rows.map((r) => r.d).sort();
  const data = [];
  const start = new Date(days[0] + "T00:00:00Z");
  const end = new Date(days[days.length - 1] + "T00:00:00Z");
  for (let t = start.getTime(); t <= end.getTime() && data.length < 120;
       t += 86400e3) {
    const d = new Date(t).toISOString().slice(0, 10);
    data.push({ d, n: byDay[d] || 0 });
  }
  const maxN = Math.max(1, ...data.map((r) => r.n));
  $("r-bars").innerHTML = data.map((r) =>
    `<i style="height:${Math.max(2, Math.round(r.n / maxN * 112))}px"` +
    ` title="${esc(r.d)}: ${r.n}"></i>`).join("");
  $("r-x0").textContent = data[0].d;
  $("r-x1").textContent = data[data.length - 1].d;
  host.classList.remove("hidden");
}

$("r-summarize").onclick = async () => {
  if (!lastReport) return msg(T("Open a report first"));
  try {
    const d = await jpost(`/api/admin/reports/${lastReport}/summarize`);
    $("r-summary").textContent = d.summary || JSON.stringify(d);
  } catch (e) { guard(e); }
};
$("r-csv").onclick = () => {
  if (!lastReport) return msg(T("Open a report first"));
  downloadAuth(`/api/admin/reports/${lastReport}/export.csv`,
               `report_${lastReport}.csv`).catch(guard);
};

/* ---------- referrals ---------- */
async function loadReferrals() {
  try {
    const d = await jget("/api/admin/referrals");
    $("ref-grid").innerHTML = [
      [d.total, T("Invited total")],
      [d.rewarded, T("Rewarded")],
      [d.conversion_pct + "%", T("Reward conversion")],
    ].map(([v, k]) =>
      `<div class="stat"><b>${esc(v)}</b><span>${esc(k)}</span></div>`)
      .join("");
    $("ref-top").innerHTML =
      "<tr><th>inviter</th><th>invited</th><th>rewarded</th></tr>" +
      (d.top_inviters || []).map((r) => `<tr>
        <td>${esc(r.email || "#" + r.inviter_id)}</td>
        <td>${r.invited}</td><td>${r.rewarded ?? 0}</td></tr>`).join("");
    $("ref-recent").innerHTML =
      "<tr><th>id</th><th>inviter</th><th>invitee</th><th>rewarded</th><th>date</th></tr>" +
      (d.recent || []).map((r) => `<tr><td>${r.id}</td>
        <td>${esc(r.inviter_email || "#" + r.inviter_id)}</td>
        <td>${esc(r.invitee_email || "#" + r.invitee_id)}</td>
        <td>${r.rewarded ? "✓" : ""}</td>
        <td>${fmtDate(r.created_at)}</td></tr>`).join("");
  } catch (e) { guard(e); }
}

/* ---------- audit ---------- */
async function loadAudit() {
  try {
    const { items } = await jget("/api/admin/audit");
    $("a-table").innerHTML =
      "<tr><th>id</th><th>admin</th><th>action</th><th>target</th><th>date</th></tr>" +
      items.map((a) => `<tr><td>${a.id}</td><td>${esc(a.admin_email || a.admin_id)}</td>
        <td>${esc(a.action)}</td><td class="mono">${esc(a.target || "")}</td>
        <td>${fmtDate(a.created_at)}</td></tr>`).join("");
  } catch (e) { guard(e); }
}

/* ---------- tools ---------- */
async function loadTools() {
  try {
    $("t-health").textContent = JSON.stringify(await jget("/api/health"), null, 2);
  } catch (e) { $("t-health").textContent = "health check failed: " + e.message; }
}

$("t-backup").onclick = () =>
  downloadAuth("/api/admin/backup/db", "amw_tpu_backup.sqlite3").catch(guard);
$("t-llm").onclick = async () => {
  try { $("t-out").textContent = JSON.stringify(await jpost("/api/admin/llm/test"), null, 2); }
  catch (e) { $("t-out").textContent = "LLM test failed: " + e.message; }
};
$("t-email").onclick = async () => {
  try { $("t-out").textContent = JSON.stringify(await jpost("/api/admin/notifications/test-email"), null, 2); }
  catch (e) { $("t-out").textContent = "Email test failed: " + e.message; }
};
$("t-tg").onclick = async () => {
  try { $("t-out").textContent = JSON.stringify(await jpost("/api/admin/notifications/test-telegram"), null, 2); }
  catch (e) { $("t-out").textContent = "Telegram test failed: " + e.message; }
};

const LOADERS = {
  stats: loadStats, users: loadUsers, transactions: loadTx, news: loadNews,
  campaigns: loadCampaigns, settings: loadSettings, prompts: loadPrompts,
  reports: loadReports, referrals: loadReferrals, audit: loadAudit,
  tools: loadTools,
};
loadStats();
