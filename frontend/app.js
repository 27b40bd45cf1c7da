/* Magic Master TPU — compact SPA (functional port of the reference frontend:
   upload → v2 master → SSE progress → download / A/B preview; extended
   analysis with spectrum + streaming preview; free LUFS tool; auth +
   history). */
"use strict";

const $ = (id) => document.getElementById(id);
const api = (p) => p; // same-origin

/* ---------- i18n (ru/en) ---------- */
const I18N = {
  ru: {
    "Master a track": "Мастеринг трека",
    "Drop a WAV/MP3/FLAC here or click to choose":
      "Перетащите WAV/MP3/FLAC сюда или кликните для выбора",
    "Master": "Мастеринг", "Analyze": "Анализ",
    "Download": "Скачать", "Analysis": "Анализ",
    "Free LUFS tool": "Бесплатный LUFS-анализ",
    "Check loudness": "Проверить громкость",
    "Account": "Аккаунт", "History": "История",
    "Sign in": "Войти", "Sign out": "Выйти", "Register": "Регистрация",
    "Share card": "Карточка",
  },
};
let lang = localStorage.getItem("mm_lang") ||
  ((navigator.language || "en").startsWith("ru") ? "ru" : "en");
function T(s) { return (I18N[lang] && I18N[lang][s]) || s; }
function applyI18n() {
  const ids = {
    "btn-master": "Master", "btn-analyze": "Analyze",
    "btn-download": "Download", "btn-tool": "Check loudness",
    "share-link": "Share card",
  };
  for (const [id, key] of Object.entries(ids)) {
    const el = $(id);
    if (el) el.textContent = T(key);
  }
  const drop0 = $("drop");
  if (drop0 && !drop0.textContent.includes("MB"))
    drop0.childNodes[0].textContent = T("Drop a WAV/MP3/FLAC here or click to choose");
  document.querySelectorAll("h2").forEach((h) => { h.textContent = T(h.textContent); });
}
window.addEventListener("DOMContentLoaded", () => {
  applyI18n();
  const sw = $("lang-switch");
  if (sw) {
    sw.textContent = lang === "ru" ? "EN" : "RU";
    sw.onclick = () => {
      lang = lang === "ru" ? "en" : "ru";
      localStorage.setItem("mm_lang", lang);
      location.reload();
    };
  }
});

/* ---------- PWA ---------- */
if ("serviceWorker" in navigator) {
  navigator.serviceWorker.register("/sw.js").catch(() => {});
}

let currentFile = null;
let currentJob = null;
let token = localStorage.getItem("mm_token") || null;

function msg(text, ms = 4000) {
  const el = $("msg");
  el.textContent = text;
  el.style.display = "block";
  clearTimeout(el._t);
  el._t = setTimeout(() => (el.style.display = "none"), ms);
}

function authHeaders() {
  return token ? { Authorization: "Bearer " + token } : {};
}

async function jget(url) {
  const r = await fetch(api(url), { headers: authHeaders() });
  if (!r.ok) throw new Error((await r.json()).detail || r.status);
  return r.json();
}

async function jpost(url, body) {
  const r = await fetch(api(url), {
    method: "POST",
    headers: { "Content-Type": "application/json", ...authHeaders() },
    body: JSON.stringify(body),
  });
  if (!r.ok) throw new Error((await r.json()).detail || r.status);
  return r.json();
}

/* ---------- styles dropdown ---------- */
(async () => {
  try {
    const { styles } = await jget("/api/styles");
    const sel = $("style");
    for (const name of Object.keys(styles)) {
      const o = document.createElement("option");
      o.value = name;
      o.textContent = `style: ${name} (${styles[name].lufs} LUFS)`;
      sel.appendChild(o);
    }
  } catch (e) { /* offline page preview */ }
})();

/* ---------- chain editor ---------- */
let chainConfig = null;

async function loadChain() {
  try {
    chainConfig = await jget("/api/v2/chain/default");
    renderChain();
  } catch (e) { /* offline preview */ }
}

function renderChain() {
  const box = $("chain-editor");
  if (!box || !chainConfig) return;
  box.innerHTML = "";
  chainConfig.modules.forEach((m, i) => {
    const row = document.createElement("label");
    row.innerHTML =
      `<input type="checkbox" data-i="${i}" ${m.enabled ? "checked" : ""}>` +
      ` ${m.id}` +
      ` <input type="number" data-amt="${i}" value="${m.amount ?? 1}"` +
      ` min="0" max="1" step="0.1" style="width:58px" title="amount">`;
    box.appendChild(row);
  });
  box.querySelectorAll("input[type=checkbox]").forEach((el) => {
    el.onchange = () => {
      chainConfig.modules[+el.dataset.i].enabled = el.checked;
    };
  });
  box.querySelectorAll("input[data-amt]").forEach((el) => {
    el.onchange = () => {
      chainConfig.modules[+el.dataset.amt].amount =
        Math.max(0, Math.min(1, parseFloat(el.value) || 1));
    };
  });
}

$("chain-reset") && ($("chain-reset").onclick = loadChain);
loadChain();

function chainConfigForSubmit() {
  if (!chainConfig) return null;
  const cfg = JSON.parse(JSON.stringify(chainConfig));
  // keep target/style in sync with the selectors
  for (const m of cfg.modules) {
    if (m.id === "style_eq") m.style = $("style").value || "standard";
  }
  return cfg;
}

/* ---------- file selection ---------- */
const drop = $("drop");
drop.addEventListener("click", () => $("file").click());
drop.addEventListener("dragover", (e) => { e.preventDefault(); drop.classList.add("active"); });
drop.addEventListener("dragleave", () => drop.classList.remove("active"));
drop.addEventListener("drop", (e) => {
  e.preventDefault(); drop.classList.remove("active");
  if (e.dataTransfer.files.length) setFile(e.dataTransfer.files[0]);
});
$("file").addEventListener("change", (e) => {
  if (e.target.files.length) setFile(e.target.files[0]);
});

function setFile(f) {
  currentFile = f;
  drop.textContent = `${f.name} (${(f.size / 1048576).toFixed(1)} MB)`;
  $("btn-master").disabled = false;
  $("btn-analyze").disabled = false;
}

/* ---------- mastering ---------- */
$("btn-master").addEventListener("click", async () => {
  if (!currentFile) return;
  const fd = new FormData();
  fd.append("file", currentFile);
  fd.append("preset", $("preset").value);
  fd.append("style", $("style").value || "standard");
  fd.append("out_format", $("format").value);
  fd.append("dither_type", $("dither").value);
  if ($("p-rumble").checked) fd.append("rumble_enabled", "true");
  if ($("p-deesser").checked) fd.append("deesser_enabled", "true");
  if ($("p-dyneq").checked) fd.append("dynamic_eq_enabled", "true");
  if ($("p-denoise").value) fd.append("denoise_preset", $("p-denoise").value);
  const ta = parseFloat($("p-ta").value);
  if (Math.abs(ta - 1) > 0.02) fd.append("transient_attack", ta);
  const pm = parseFloat($("p-pm").value);
  if (pm > 0) fd.append("parallel_mix", pm);
  const cfg = chainConfigForSubmit();
  if (cfg) fd.append("config", JSON.stringify(cfg));

  $("btn-master").disabled = true;
  try {
    const r = await fetch(api("/api/v2/master"), {
      method: "POST", body: fd, headers: authHeaders(),
    });
    if (!r.ok) throw new Error((await r.json()).detail || r.status);
    const { job_id } = await r.json();
    currentJob = job_id;
    $("job").classList.remove("hidden");
    $("done-row").classList.add("hidden");
    watchProgress(job_id);
  } catch (e) {
    msg("Error: " + e.message);
    $("btn-master").disabled = false;
  }
});

function watchProgress(jobId) {
  const es = new EventSource(api(`/api/master/progress/${jobId}`));
  es.onmessage = (ev) => {
    const d = JSON.parse(ev.data);
    $("bar").style.width = (d.progress || 0) + "%";
    $("status").textContent = d.message || d.status;
    if (d.status === "done") {
      es.close();
      $("bar").style.width = "100%";
      $("done-row").classList.remove("hidden");
      $("btn-master").disabled = false;
      $("share-link").href = api(`/api/master/share/${jobId}`);
      if (d.before_lufs != null && d.after_lufs != null)
        $("lufs-delta").textContent =
          `${d.before_lufs} LUFS → ${d.after_lufs} LUFS`;
    } else if (d.status === "error") {
      es.close();
      msg("Mastering failed: " + (d.error || "unknown"), 8000);
      $("btn-master").disabled = false;
    }
  };
  es.onerror = () => { es.close(); pollProgress(jobId); };
}

async function pollProgress(jobId) {
  try {
    const d = await jget(`/api/master/status/${jobId}`);
    $("bar").style.width = (d.progress || 0) + "%";
    $("status").textContent = d.message || d.status;
    if (d.status === "done") { $("done-row").classList.remove("hidden"); $("btn-master").disabled = false; return; }
    if (d.status === "error") { msg("Failed: " + d.error, 8000); $("btn-master").disabled = false; return; }
    setTimeout(() => pollProgress(jobId), 700);
  } catch (e) { msg("Lost job: " + e.message); }
}

$("btn-download").addEventListener("click", () => {
  window.location = api(`/api/master/result/${currentJob}`);
});

let abAudio = null;
function playPreview(src) {
  if (abAudio) { abAudio.pause(); abAudio = null; }
  abAudio = new Audio(api(`/api/master/preview/${currentJob}?src=${src}`));
  abAudio.play();
}
$("btn-ab-orig").addEventListener("click", () => playPreview("original"));
$("btn-ab-mastered").addEventListener("click", () => playPreview("mastered"));

/* ---------- analysis ---------- */
$("btn-analyze").addEventListener("click", async () => {
  if (!currentFile) return;
  const fd = new FormData();
  fd.append("file", currentFile);
  fd.append("extended", "true");
  $("btn-analyze").disabled = true;
  try {
    const r = await fetch(api("/api/v2/analyze"), { method: "POST", body: fd, headers: authHeaders() });
    if (!r.ok) throw new Error((await r.json()).detail || r.status);
    renderAnalysis(await r.json());
  } catch (e) { msg("Analyze failed: " + e.message); }
  $("btn-analyze").disabled = false;
});

function renderAnalysis(a) {
  $("analysis").classList.remove("hidden");
  $("an-summary").innerHTML =
    `<b>${a.lufs ?? "—"} LUFS</b> · peak ${a.peak_dbfs} dBFS · ` +
    `${a.duration_sec}s · ${a.sample_rate} Hz · ${a.channels}ch` +
    (a.stereo_correlation != null ? ` · corr ${a.stereo_correlation}` : "");
  const bars = $("spectrum");
  bars.innerHTML = "";
  (a.spectrum_bars || []).forEach((db) => {
    const i = document.createElement("i");
    i.style.height = Math.max(2, (db + 80) / 80 * 90) + "px";
    bars.appendChild(i);
  });
  const t = $("streaming");
  t.innerHTML = "<tr><th>Platform</th><th>Target</th><th>Penalty</th><th>Status</th></tr>";
  for (const [name, p] of Object.entries(a.streaming_preview || {})) {
    t.innerHTML += `<tr><td>${name}</td><td>${p.target_lufs}</td>` +
      `<td>${p.penalty_db} dB</td><td class="${p.status === "optimal" ? "ok" : ""}">${p.status}</td></tr>`;
  }
}

/* ---------- LUFS tool ---------- */
$("btn-tool").addEventListener("click", async () => {
  const f = $("tool-file").files[0];
  if (!f) return msg("Choose a file first");
  const fd = new FormData();
  fd.append("file", f);
  try {
    const r = await fetch(api("/api/tools/lufs-analyze"), { method: "POST", body: fd });
    if (!r.ok) throw new Error((await r.json()).detail || r.status);
    const d = await r.json();
    $("tool-out").innerHTML =
      `<b>${d.integrated_lufs} LUFS</b> · true peak ${d.true_peak_dbfs} dBTP · ` +
      `LRA ${d.loudness_range_lu} LU<br>` +
      `Spotify ${d.spotify_ready ? "✅" : "✖"} · Apple ${d.apple_ready ? "✅" : "✖"} · ` +
      `YouTube ${d.youtube_ready ? "✅" : "✖"}<br>` +
      d.recommendations.map((x) => "• " + x).join("<br>");
  } catch (e) { msg("Tool failed: " + e.message); }
});

/* ---------- auth ---------- */
const dlg = $("auth-dialog");
$("btn-auth").addEventListener("click", () => {
  if (token) { logout(); } else dlg.showModal();
});
$("btn-close").addEventListener("click", () => dlg.close());
$("btn-login").addEventListener("click", () => doAuth("/api/auth/login"));
$("btn-register").addEventListener("click", () => doAuth("/api/auth/register"));

async function doAuth(url) {
  try {
    const d = await jpost(url, { email: $("auth-email").value, password: $("auth-pass").value });
    token = d.access_token;
    localStorage.setItem("mm_token", token);
    dlg.close();
    refreshUser();
  } catch (e) { msg("Auth failed: " + e.message); }
}

function logout() {
  token = null;
  localStorage.removeItem("mm_token");
  refreshUser();
}

async function refreshUser() {
  if (!token) {
    $("whoami").textContent = "";
    $("btn-auth").textContent = "Sign in";
    $("account").classList.add("hidden");
    return;
  }
  try {
    const me = await jget("/api/auth/me");
    $("whoami").textContent = `${me.email} · ${me.tier}`;
    $("btn-auth").textContent = "Sign out";
    $("account").classList.remove("hidden");
    const prof = await jget("/api/auth/profile");
    $("acct-info").textContent =
      `tier ${prof.tier} · ${prof.tokens} tokens · ` +
      `${prof.stats.masterings_total} masterings`;
    const h = await jget("/api/auth/history");
    const t = $("history");
    t.innerHTML = "<tr><th>File</th><th>Style</th><th>Target</th><th>Result</th></tr>";
    for (const r of h.items.slice(0, 20)) {
      t.innerHTML += `<tr><td>${r.filename || ""}</td><td>${r.style || ""}</td>` +
        `<td>${r.target_lufs ?? ""}</td><td>${r.after_lufs ?? ""} LUFS</td></tr>`;
    }
  } catch (e) { logout(); }
}
refreshUser();
