/* Magic Master TPU — studio page: single-track mastering (v2 + auto), batch
   mastering, extended analysis, tools (LUFS / vocal isolation / upscale /
   reference match), AI assistant, news.  Shared helpers live in mm.js.
   (Functional equivalent of the reference frontend/app.js mastering flows:
   upload → SSE progress → download / A-B preview, batch flow, tool calls.) */
"use strict";

mmHeader("/app");

let currentFile = null;
let currentJob = null;

/* ---------- styles dropdown + version ---------- */
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
  } catch (e) { /* offline preview */ }
  try {
    const v = await jget("/api/version");
    $("version").textContent = `v${v.version} · ${v.backend || "tpu"}`;
  } catch (e) { /* offline */ }
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
    row.className = "chk";
    row.innerHTML =
      `<input type="checkbox" data-i="${i}" ${m.enabled ? "checked" : ""}>` +
      ` ${esc(m.id)}` +
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

$("chain-reset").onclick = loadChain;
loadChain();

/* saved user presets (auth) */
async function loadUserPresets() {
  if (!mmToken) return;
  try {
    const { items } = await jget("/api/auth/presets");
    const sel = $("chain-presets");
    if (!items.length) return;
    sel.classList.remove("hidden");
    sel.innerHTML = "<option value=''>My presets…</option>" + items.map(
      (p) => `<option value="${p.id}">${esc(p.name)}</option>`).join("");
    sel.onchange = async () => {
      if (!sel.value) return;
      try {
        const p = await jget(`/api/auth/presets/${sel.value}`);
        chainConfig = typeof p.config === "string"
          ? JSON.parse(p.config) : p.config;
        renderChain();
        msg(`Preset "${p.name}" loaded`);
      } catch (e) { msg("Preset load failed: " + e.message); }
    };
  } catch (e) { /* not signed in */ }
}
loadUserPresets();

$("chain-save").onclick = async () => {
  if (!mmToken) return msg(T("Sign in") + " first");
  const name = prompt("Preset name:");
  if (!name || !chainConfig) return;
  try {
    await jpost("/api/auth/presets", { name, config: chainConfig });
    msg("Preset saved");
    loadUserPresets();
  } catch (e) { msg("Save failed: " + e.message); }
};

function chainConfigForSubmit() {
  if (!chainConfig) return null;
  const cfg = JSON.parse(JSON.stringify(chainConfig));
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
  drop.textContent = `${f.name} (${fmtBytes(f.size)})`;
  for (const id of ["btn-master", "btn-analyze", "btn-auto"])
    $(id).disabled = false;
}

/* ---------- mastering ---------- */
function proFields(fd) {
  if ($("p-rumble").checked) fd.append("rumble_enabled", "true");
  if ($("p-deesser").checked) fd.append("deesser_enabled", "true");
  if ($("p-dyneq").checked) fd.append("dynamic_eq_enabled", "true");
  if ($("p-denoise").value) fd.append("denoise_preset", $("p-denoise").value);
  const ta = parseFloat($("p-ta").value);
  if (Math.abs(ta - 1) > 0.02) fd.append("transient_attack", ta);
  const pm = parseFloat($("p-pm").value);
  if (pm > 0) fd.append("parallel_mix", pm);
}

async function submitMaster(url, extra) {
  if (!currentFile) return;
  const fd = new FormData();
  fd.append("file", currentFile);
  fd.append("preset", $("preset").value);
  fd.append("style", $("style").value || "standard");
  fd.append("out_format", $("format").value);
  fd.append("dither_type", $("dither").value);
  proFields(fd);
  if (extra !== "auto") {
    const cfg = chainConfigForSubmit();
    if (cfg) fd.append("config", JSON.stringify(cfg));
  }
  $("btn-master").disabled = true;
  $("btn-auto").disabled = true;
  try {
    const r = await jupload(url, fd);
    const d = await r.json();
    currentJob = d.job_id;
    if (d.recommendation)
      msg(`AI: ${d.recommendation.style || "standard"} @ ` +
          `${d.recommendation.target_lufs ?? d.target_lufs} LUFS`);
    $("job").classList.remove("hidden");
    $("done-row").classList.add("hidden");
    watchProgress(d.job_id);
  } catch (e) {
    msg("Error: " + e.message);
    $("btn-master").disabled = false;
    $("btn-auto").disabled = false;
  }
}

$("btn-master").addEventListener("click", () => submitMaster("/api/v2/master"));
$("btn-auto").addEventListener("click", () => submitMaster("/api/v2/master/auto", "auto"));

function watchProgress(jobId, onDone) {
  const es = new EventSource(api(`/api/master/progress/${jobId}`));
  es.onmessage = (ev) => {
    const d = JSON.parse(ev.data);
    if (!onDone) {
      $("bar").style.width = (d.progress || 0) + "%";
      $("status").textContent = d.message || d.status;
    }
    if (d.status === "done") {
      es.close();
      if (onDone) return onDone(null, d);
      $("bar").style.width = "100%";
      $("done-row").classList.remove("hidden");
      $("btn-master").disabled = false;
      $("btn-auto").disabled = false;
      $("share-link").href = api(`/api/master/share/${jobId}`);
      if (d.before_lufs != null && d.after_lufs != null)
        $("lufs-delta").textContent =
          `${d.before_lufs} LUFS → ${d.after_lufs} LUFS`;
    } else if (d.status === "error") {
      es.close();
      if (onDone) return onDone(d.error || "unknown", d);
      msg("Mastering failed: " + (d.error || "unknown"), 8000);
      $("btn-master").disabled = false;
      $("btn-auto").disabled = false;
    } else if (onDone) onDone.progress && onDone.progress(d);
  };
  es.onerror = () => { es.close(); pollProgress(jobId, onDone); };
}

async function pollProgress(jobId, onDone) {
  try {
    const d = await jget(`/api/master/status/${jobId}`);
    if (!onDone) {
      $("bar").style.width = (d.progress || 0) + "%";
      $("status").textContent = d.message || d.status;
    }
    if (d.status === "done") {
      if (onDone) return onDone(null, d);
      $("done-row").classList.remove("hidden");
      $("btn-master").disabled = false;
      return;
    }
    if (d.status === "error") {
      if (onDone) return onDone(d.error || "unknown", d);
      msg("Failed: " + d.error, 8000);
      $("btn-master").disabled = false;
      return;
    }
    setTimeout(() => pollProgress(jobId, onDone), 700);
  } catch (e) { if (onDone) onDone(e.message, null); else msg("Lost job: " + e.message); }
}

$("btn-download").addEventListener("click", () => {
  window.location = api(`/api/master/result/${currentJob}`);
});

/* A/B preview with a live WebAudio spectrum + level scope (reference
   app.js renders canvas visualizers during preview playback). */
let abAudio = null;
let abCtx = null, abAnalyser = null, abSource = null, abRaf = 0;

function stopScope() {
  cancelAnimationFrame(abRaf);
  // Disconnect the previous graph nodes — otherwise each A/B click leaks
  // a source+analyser pair wired into the shared AudioContext.
  try { abSource && abSource.disconnect(); } catch (e) { /* detached */ }
  try { abAnalyser && abAnalyser.disconnect(); } catch (e) { /* detached */ }
  abSource = abAnalyser = null;
  const cv = $("ab-scope");
  if (cv) cv.classList.add("hidden");
}

function drawScope(label) {
  const cv = $("ab-scope");
  if (!cv || !abAnalyser) return;
  cv.classList.remove("hidden");
  const g = cv.getContext("2d");
  const bins = new Uint8Array(abAnalyser.frequencyBinCount);
  const wave = new Uint8Array(abAnalyser.fftSize);
  const Wc = cv.width, Hc = cv.height;
  const nBars = 96;
  const acc = getComputedStyle(document.documentElement)
    .getPropertyValue("--acc2").trim() || "#60c8ff";
  function frame() {
    abRaf = requestAnimationFrame(frame);
    abAnalyser.getByteFrequencyData(bins);
    abAnalyser.getByteTimeDomainData(wave);
    g.clearRect(0, 0, Wc, Hc);
    // log-spaced spectrum bars
    const bw = Wc / nBars;
    for (let i = 0; i < nBars; i++) {
      const lo = Math.floor(Math.pow(bins.length, i / nBars));
      const hi = Math.max(lo + 1, Math.floor(Math.pow(bins.length, (i + 1) / nBars)));
      let v = 0;
      for (let j = lo; j < hi; j++) v = Math.max(v, bins[j]);
      const h = (v / 255) * (Hc - 14);
      g.fillStyle = acc;
      g.globalAlpha = 0.9;
      g.fillRect(i * bw + 1, Hc - h, bw - 2, h);
    }
    // peak level from the waveform
    let peak = 0;
    for (let i = 0; i < wave.length; i += 16)
      peak = Math.max(peak, Math.abs(wave[i] - 128) / 128);
    g.globalAlpha = 1;
    g.fillStyle = "#ebeef5";
    g.font = "11px system-ui";
    g.fillText(`${label} · peak ${(20 * Math.log10(Math.max(peak, 1e-4))).toFixed(1)} dBFS`, 8, 13);
  }
  frame();
}

let abJob = null;

function playPreview(src) {
  // carry the playback position across A/B switches (same job only) so
  // the comparison stays at the same musical moment
  const pos = (abJob === currentJob && abAudio && !abAudio.ended)
    ? abAudio.currentTime : 0;
  abJob = currentJob;
  if (abAudio) { abAudio.pause(); abAudio = null; }
  stopScope();
  abAudio = new Audio(api(`/api/master/preview/${currentJob}?src=${src}`));
  if (pos > 0.05) {
    const el = abAudio; // the element this handler belongs to
    el.addEventListener("loadedmetadata", () => {
      if (el === abAudio && pos < (el.duration || 0)) el.currentTime = pos;
    }, { once: true });
  }
  abAudio.crossOrigin = "anonymous";
  try {
    abCtx = abCtx || new (window.AudioContext || window.webkitAudioContext)();
    abSource = abCtx.createMediaElementSource(abAudio);
    abAnalyser = abCtx.createAnalyser();
    abAnalyser.fftSize = 2048;
    abSource.connect(abAnalyser);
    abAnalyser.connect(abCtx.destination);
    drawScope(src);
    abAudio.onended = stopScope;
  } catch (e) { /* visualization is optional; audio still plays */ }
  abAudio.play();
}
$("btn-ab-orig").addEventListener("click", () => playPreview("original"));
$("btn-ab-mastered").addEventListener("click", () => playPreview("mastered"));

/* ---------- batch mastering ---------- */
let batchFiles = [];
const bdrop = $("batch-drop");
bdrop.addEventListener("click", () => $("batch-files").click());
bdrop.addEventListener("dragover", (e) => { e.preventDefault(); bdrop.classList.add("active"); });
bdrop.addEventListener("dragleave", () => bdrop.classList.remove("active"));
bdrop.addEventListener("drop", (e) => {
  e.preventDefault(); bdrop.classList.remove("active");
  addBatchFiles(e.dataTransfer.files);
});
$("batch-files").addEventListener("change", (e) => addBatchFiles(e.target.files));

function addBatchFiles(list) {
  for (const f of list) batchFiles.push(f);
  $("batch-count").textContent =
    `${batchFiles.length} files · ${fmtBytes(batchFiles.reduce((s, f) => s + f.size, 0))}`;
  $("btn-batch").disabled = batchFiles.length === 0;
  $("btn-batch-clear").classList.toggle("hidden", batchFiles.length === 0);
  renderBatchTable();
}

$("btn-batch-clear").onclick = () => {
  batchFiles = [];
  addBatchFiles([]);
  $("batch-table").classList.add("hidden");
};

function renderBatchTable(status) {
  const t = $("batch-table");
  if (!batchFiles.length) { t.classList.add("hidden"); return; }
  t.classList.remove("hidden");
  t.innerHTML = "<tr><th>File</th><th>Size</th><th>Status</th><th></th></tr>" +
    batchFiles.map((f, i) => {
      const st = (status && status[i]) || {};
      const pct = st.progress != null ? ` ${st.progress}%` : "";
      const link = st.done
        ? `<a class="btn small sec" href="/api/master/result/${st.job}">↓</a>` : "";
      return `<tr><td>${esc(f.name)}</td><td>${fmtBytes(f.size)}</td>` +
        `<td class="${st.error ? "bad" : st.done ? "ok" : ""}">` +
        `${esc(st.error || st.msg || "queued")}${pct}</td><td>${link}</td></tr>`;
    }).join("");
}

$("btn-batch").addEventListener("click", async () => {
  if (!batchFiles.length) return;
  const fd = new FormData();
  for (const f of batchFiles) fd.append("files", f);
  fd.append("preset", $("preset").value);
  fd.append("style", $("style").value || "standard");
  fd.append("out_format", $("format").value);
  $("btn-batch").disabled = true;
  let jobIds;
  try {
    const r = await jupload("/api/v2/batch", fd);
    jobIds = (await r.json()).job_ids;
  } catch (e) {
    msg("Batch failed: " + e.message, 8000);
    $("btn-batch").disabled = false;
    return;
  }
  const status = batchFiles.map((_, i) => ({ job: jobIds[i] }));
  renderBatchTable(status);
  let open = 0;
  jobIds.forEach((jobId, i) => {
    open++;
    const onDone = (err, d) => {
      if (err) status[i].error = err;
      else { status[i].done = true; status[i].msg = "done"; }
      renderBatchTable(status);
      if (--open === 0) $("btn-batch").disabled = false;
    };
    onDone.progress = (d) => {
      status[i].msg = d.message || d.status;
      status[i].progress = d.progress;
      renderBatchTable(status);
    };
    watchProgress(jobId, onDone);
  });
});

/* ---------- analysis ---------- */
$("btn-analyze").addEventListener("click", async () => {
  if (!currentFile) return;
  const fd = new FormData();
  fd.append("file", currentFile);
  fd.append("extended", "true");
  $("btn-analyze").disabled = true;
  try {
    const r = await jupload("/api/v2/analyze", fd);
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
    t.innerHTML += `<tr><td>${esc(name)}</td><td>${p.target_lufs}</td>` +
      `<td>${p.penalty_db} dB</td><td class="${p.status === "optimal" ? "ok" : ""}">${esc(p.status)}</td></tr>`;
  }
}

/* ---------- tools ---------- */
function toolFile() {
  const f = $("tool-file").files[0];
  if (!f) { msg("Choose a file first"); return null; }
  return f;
}

async function downloadResponse(r, fallback) {
  const blob = await r.blob();
  const cd = r.headers.get("Content-Disposition") || "";
  const m = cd.match(new RegExp('filename="([^"]+)"'));
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = m ? m[1] : fallback;
  a.click();
  URL.revokeObjectURL(a.href);
}

$("btn-tool").addEventListener("click", async () => {
  const f = toolFile();
  if (!f) return;
  const fd = new FormData();
  fd.append("file", f);
  try {
    const r = await jupload("/api/tools/lufs-analyze", fd);
    const d = await r.json();
    $("tool-out").innerHTML =
      `<b>${d.integrated_lufs} LUFS</b> · true peak ${d.true_peak_dbfs} dBTP · ` +
      `LRA ${d.loudness_range_lu} LU<br>` +
      `Spotify ${d.spotify_ready ? "✅" : "✖"} · Apple ${d.apple_ready ? "✅" : "✖"} · ` +
      `YouTube ${d.youtube_ready ? "✅" : "✖"}<br>` +
      d.recommendations.map((x) => "• " + esc(x)).join("<br>");
  } catch (e) { msg("Tool failed: " + e.message); }
});

$("btn-vocal").addEventListener("click", async () => {
  const f = toolFile();
  if (!f) return;
  const fd = new FormData();
  fd.append("file", f);
  $("tool-out").textContent = "Separating vocals (htdemucs)…";
  try {
    const r = await jupload("/api/v2/isolate-vocal", fd);
    await downloadResponse(r, "vocals.wav");
    $("tool-out").textContent = "Vocals ready — downloaded.";
  } catch (e) { $("tool-out").textContent = ""; msg("Vocal isolation failed: " + e.message, 8000); }
});

$("btn-upscale").addEventListener("click", async () => {
  const f = toolFile();
  if (!f) return;
  const fd = new FormData();
  fd.append("file", f);
  fd.append("target_sr", "48000");
  $("tool-out").textContent = "Upscaling to 48 kHz…";
  try {
    const r = await jupload("/api/v2/upscale", fd);
    await downloadResponse(r, "upscaled_48k.wav");
    $("tool-out").textContent = "48 kHz version downloaded.";
  } catch (e) { $("tool-out").textContent = ""; msg("Upscale failed: " + e.message); }
});

$("btn-refmatch").addEventListener("click", async () => {
  const f = toolFile();
  const ref = $("ref-file").files[0];
  if (!f) return;
  if (!ref) return msg("Choose a reference track");
  const fd = new FormData();
  fd.append("file", f);
  fd.append("reference", ref);
  fd.append("strength", $("ref-strength").value || "0.8");
  $("tool-out").textContent = "Matching the reference tonality…";
  try {
    const r = await jupload("/api/v2/reference-match", fd);
    await downloadResponse(r, "matched.wav");
    $("tool-out").textContent = "Reference-matched master downloaded.";
  } catch (e) { $("tool-out").textContent = ""; msg("Reference match failed: " + e.message, 8000); }
});

/* ---------- AI assistant ---------- */
const chatHistory = [];

$("btn-ai-chat").addEventListener("click", async () => {
  const q = $("ai-q").value.trim();
  if (!q) return;
  $("ai-out").textContent = "…";
  chatHistory.push({ role: "user", content: q });
  try {
    const d = await jpost("/api/ai/chat", { messages: chatHistory });
    chatHistory.push({ role: "assistant", content: d.reply || "" });
    $("ai-out").textContent = d.reply || JSON.stringify(d);
  } catch (e) {
    chatHistory.pop();
    $("ai-out").textContent = "";
    msg("AI failed: " + e.message);
  }
});

$("btn-ai-config").addEventListener("click", async () => {
  const q = $("ai-q").value.trim();
  if (!q) return msg("Describe the sound you want first");
  $("ai-out").textContent = "…";
  try {
    const d = await jpost("/api/ai/nl-config", { text: q });
    if (d.chain_config) {
      chainConfig = d.chain_config;
      renderChain();
      if (d.style) $("style").value = d.style;
      $("ai-out").textContent =
        "Chain config applied — see the chain editor above.\n" +
        (d.reason || "");
    } else $("ai-out").textContent = JSON.stringify(d, null, 2);
  } catch (e) { $("ai-out").textContent = ""; msg("AI failed: " + e.message); }
});

$("btn-ai-recommend").addEventListener("click", async () => {
  if (!currentFile) return msg("Choose a track first (top card)");
  const fd = new FormData();
  fd.append("file", currentFile);
  $("ai-out").textContent = "Analyzing…";
  try {
    const r = await jupload("/api/ai/recommend", fd);
    const d = await r.json();
    $("ai-out").textContent =
      `Preset: ${d.style || "standard"} @ ` +
      `${d.target_lufs ?? "-14"} LUFS\n${d.reason || ""}`;
    if (d.style) $("style").value = d.style;
  } catch (e) { $("ai-out").textContent = ""; msg("AI failed: " + e.message); }
});

/* ---------- news ---------- */
(async () => {
  try {
    const { items } = await jget("/api/news");
    if (!items || !items.length) return;
    $("news-card").classList.remove("hidden");
    $("news-list").innerHTML = items.slice(0, 5).map((n) =>
      `<h3>${esc(n.title)}</h3><p class="muted">${esc(n.body || n.content || "")}</p>`
    ).join("");
  } catch (e) { /* none */ }
})();
