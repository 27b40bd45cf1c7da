/* Magic Master TPU — shared page runtime: API helpers, auth/session state,
   i18n (en/ru), nav injection, toasts.  Every page loads this before its own
   script.  (Reference analog: frontend/i18n.js + duplicated helpers in
   app.js / admin.html / dashboard.html.) */
"use strict";

const $ = (id) => document.getElementById(id);
const api = (p) => p; // same-origin

/* ---------- session ---------- */
let mmToken = localStorage.getItem("mm_token") || null;

function authHeaders() {
  return mmToken ? { Authorization: "Bearer " + mmToken } : {};
}

function setToken(t) {
  mmToken = t;
  if (t) localStorage.setItem("mm_token", t);
  else localStorage.removeItem("mm_token");
}

async function jget(url) {
  const r = await fetch(api(url), { headers: authHeaders() });
  if (!r.ok) throw new Error(await errDetail(r));
  return r.json();
}

async function jpost(url, body, method = "POST") {
  const r = await fetch(api(url), {
    method,
    headers: { "Content-Type": "application/json", ...authHeaders() },
    body: body === undefined ? undefined : JSON.stringify(body),
  });
  if (!r.ok) throw new Error(await errDetail(r));
  return r.json();
}

const jpatch = (url, body) => jpost(url, body, "PATCH");
const jdelete = (url) => jpost(url, undefined, "DELETE");

async function jupload(url, formData) {
  const r = await fetch(api(url), {
    method: "POST", body: formData, headers: authHeaders(),
  });
  if (!r.ok) throw new Error(await errDetail(r));
  return r;
}

async function errDetail(r) {
  try { return (await r.json()).detail || String(r.status); }
  catch (e) { return String(r.status); }
}

function msg(text, ms = 4500) {
  let el = $("msg");
  if (!el) {
    el = document.createElement("div");
    el.id = "msg";
    document.body.appendChild(el);
  }
  el.textContent = text;
  el.style.display = "block";
  clearTimeout(el._t);
  el._t = setTimeout(() => (el.style.display = "none"), ms);
}

function fmtBytes(b) {
  return b > 1048576 ? (b / 1048576).toFixed(1) + " MB"
    : (b / 1024).toFixed(0) + " KB";
}

function fmtDate(ts) {
  if (!ts) return "";
  return new Date(ts * 1000).toISOString().slice(0, 16).replace("T", " ");
}

function fmtTime(sec) {
  if (sec == null || isNaN(sec)) return "0:00";
  const m = Math.floor(sec / 60), s = Math.floor(sec % 60);
  return `${m}:${String(s).padStart(2, "0")}`;
}

/* CSS variable lookup for canvas drawing (theme-aware). */
function cssVar(name, fallback) {
  return getComputedStyle(document.documentElement)
    .getPropertyValue(name).trim() || fallback;
}

function esc(s) {
  // Safe for text nodes AND double/single-quoted attribute values.
  return String(s == null ? "" : s)
    .split("&").join("&amp;").split("<").join("&lt;").split(">").join("&gt;")
    .split('"').join("&quot;").split("'").join("&#39;");
}

async function downloadAuth(url, fallbackName) {
  // Plain <a href> loses the Authorization header — fetch + blob instead.
  const r = await fetch(api(url), { headers: authHeaders() });
  if (!r.ok) throw new Error(await errDetail(r));
  const blob = await r.blob();
  const cd = r.headers.get("Content-Disposition") || "";
  const m = cd.match(new RegExp('filename="?([^";]+)"?'));
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = m ? m[1] : fallbackName;
  a.click();
  URL.revokeObjectURL(a.href);
}

function safeNext(raw, fallback) {
  // Same-origin path only: forbid absolute URLs and protocol-relative //.
  return raw && raw.startsWith("/") && !raw.startsWith("//")
    ? raw : fallback;
}

/* ---------- i18n ---------- */
// ?lang=en|ru in the URL wins and persists — it is what the hreflang
// alternate links on the public pages point crawlers and shared links at
// (reference i18n.js honors the same parameter).
const mmLangParam = new URLSearchParams(location.search).get("lang");
if (mmLangParam === "ru" || mmLangParam === "en") {
  localStorage.setItem("mm_lang", mmLangParam);
}
let mmLang = localStorage.getItem("mm_lang") ||
  ((navigator.language || "en").startsWith("ru") ? "ru" : "en");
let mmDict = {};

function T(key) { return mmDict[key] || key; }

async function loadLocale() {
  // Every language (en included) has a dictionary: locales/en.json is the
  // identity catalog of all UI strings, so operators can retune English
  // copy without editing markup — mirrors the reference's i18n.js
  // en.json/ru.json pair.  Identity entries render the same text, and
  // applyI18n only rewrites keys present in the dictionary.
  try {
    const r = await fetch(`/static/locales/${mmLang}.json`);
    mmDict = r.ok ? await r.json() : {};
  } catch (e) { mmDict = {}; }
}

function applyI18n(root = document) {
  // Only rewrite when a translation exists — the default language keeps
  // the original markup (e.g. <em> inside tagged headings) intact.
  root.querySelectorAll("[data-i18n]").forEach((el) => {
    const t = mmDict[el.dataset.i18n];
    // Identity entries (the en.json catalog) are skipped: the markup
    // already shows that text, and rewriting would flatten inline tags.
    if (t && t !== el.dataset.i18n) el.textContent = t;
  });
  root.querySelectorAll("[data-i18n-ph]").forEach((el) => {
    const t = mmDict[el.dataset.i18nPh];
    if (t) el.placeholder = t;
  });
}

function toggleLang() {
  mmLang = mmLang === "ru" ? "en" : "ru";
  localStorage.setItem("mm_lang", mmLang);
  location.reload();
}

/* ---------- theme ---------- */
let mmTheme = localStorage.getItem("mm_theme") || "dark";
if (mmTheme === "light") document.documentElement.classList.add("light");

function toggleTheme() {
  mmTheme = mmTheme === "light" ? "dark" : "light";
  localStorage.setItem("mm_theme", mmTheme);
  document.documentElement.classList.toggle("light", mmTheme === "light");
  const b = $("mm-theme");
  if (b) b.textContent = mmTheme === "light" ? "🌙" : "☀";
  // canvases repaint from CSS vars on the next draw
  window.dispatchEvent(new Event("mm-theme"));
}

/* ---------- PWA install prompt ---------- */
let mmInstallEvt = null;
window.addEventListener("beforeinstallprompt", (e) => {
  e.preventDefault();
  mmInstallEvt = e;
  const b = $("mm-install");
  if (b) b.classList.remove("hidden");
});

/* ---------- shared nav ---------- */
const MM_NAV = [
  ["/app", "Studio"],
  ["/dashboard", "Dashboard"],
  ["/lufs-analyzer", "LUFS tool"],
  ["/pricing", "Pricing"],
  ["/referral", "Referral"],
  ["/blog", "Blog"],
];

async function mmHeader(active) {
  await loadLocale();
  const host = document.querySelector("header.mm");
  if (!host) { applyI18n(); return; }
  const here = active || location.pathname;
  const links = MM_NAV.map(([href, label]) =>
    `<a href="${href}" class="${here === href ? "active" : ""}"` +
    ` data-i18n="${label}">${label}</a>`).join("");
  host.innerHTML =
    `<h1><a href="/">🎛 Magic <span>Master</span>` +
    ` <span class="muted">TPU</span></a></h1>` +
    `<nav class="mm">${links}` +
    `<button class="sec small hidden" id="mm-install" title="Install app">⤓ App</button>` +
    `<button class="sec small" id="mm-theme" title="Theme">${mmTheme === "light" ? "🌙" : "☀"}</button>` +
    `<button class="sec small" id="mm-lang">${mmLang === "ru" ? "EN" : "RU"}</button>` +
    `<button class="sec small" id="mm-auth" data-i18n="Sign in">Sign in</button></nav>`;
  $("mm-lang").onclick = toggleLang;
  $("mm-theme").onclick = toggleTheme;
  $("mm-install").onclick = async () => {
    if (!mmInstallEvt) return;
    mmInstallEvt.prompt();
    await mmInstallEvt.userChoice;
    mmInstallEvt = null;
    $("mm-install").classList.add("hidden");
  };
  if (mmInstallEvt) $("mm-install").classList.remove("hidden");
  $("mm-auth").onclick = () => {
    if (mmToken) { setToken(null); location.reload(); }
    else location.href = "/login?next=" + encodeURIComponent(location.pathname);
  };
  applyI18n();
  mmFooter();
  refreshWho();
}

/* Shared footer for the public pages: product / developer / support link
   columns + API version line (reference pages carry the same footer grid;
   ours is injected once here instead of duplicated per page). */
const MM_FOOT = [
  ["Product", [
    ["/app", "Studio"],
    ["/pricing", "Pricing"],
    ["/blog", "Blog"],
    ["/lufs-analyzer", "LUFS tool"],
    ["/telegram-bot", "Telegram bot"],
    ["/referral", "Referral"],
  ]],
  ["Guides", [
    ["/suno-mastering", "Suno mastering"],
    ["/udio-mastering", "Udio mastering"],
    ["/podcast-mastering", "Podcast mastering"],
  ]],
  ["Developers", [
    ["/status", "Status"],
    ["/api/health", "Service health"],
    ["/progress.html", "Build progress"],
  ]],
];

function mmFooter() {
  const host = document.querySelector("footer.mm");
  if (!host || host.childElementCount) return;  // page brought its own
  const cols = MM_FOOT.map(([title, links]) =>
    `<div class="foot-col"><div class="muted" style="margin-bottom:6px">` +
    `<b data-i18n="${title}">${title}</b></div>` +
    links.map(([href, label]) =>
      `<a href="${href}" style="display:block;margin-bottom:4px"` +
      ` data-i18n="${label}">${label}</a>`).join("") + `</div>`).join("");
  host.innerHTML =
    `<div class="row" style="align-items:flex-start;gap:40px">${cols}</div>` +
    `<div style="flex:1"></div>` +
    `<div><div data-i18n="Audio mastering on TPU.">Audio mastering on TPU.</div>` +
    `<div class="mono" id="mm-foot-version"></div></div>`;
  applyI18n(host);
  fetch("/api/version").then((r) => (r.ok ? r.json() : null)).then((d) => {
    const el = $("mm-foot-version");
    if (d && el) el.textContent = (d.version ? "v" + d.version : "") +
      (d.build_date ? " · " + d.build_date : "");
  }).catch(() => {});
}

async function refreshWho() {
  if (!mmToken) return null;
  try {
    const me = await jget("/api/auth/me");
    const b = $("mm-auth");
    if (b) b.textContent = `${me.email.split("@")[0]} · ${T("Sign out")}`;
    return me;
  } catch (e) { setToken(null); return null; }
}

/* ---------- PWA ---------- */
if ("serviceWorker" in navigator) {
  navigator.serviceWorker.register("/sw.js").catch(() => {});
}
