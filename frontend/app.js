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
      } catch (e) { msg(T("Preset load failed: ") + e.message); }
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
    msg(T("Preset saved"));
    loadUserPresets();
  } catch (e) { msg(T("Save failed: ") + e.message); }
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
  loadWave(f);
}

/* ---------- mastering ---------- */
function proFields(fd) {
  if ($("p-rumble").checked) {
    fd.append("rumble_enabled", "true");
    const hz = parseFloat($("p-rumble-hz").value);
    if (hz && Math.abs(hz - 80) > 0.5) fd.append("rumble_cutoff", hz);
  }
  if ($("p-deesser").checked) {
    fd.append("deesser_enabled", "true");
    const thr = parseFloat($("p-des-thr").value);
    if (!Number.isNaN(thr) && Math.abs(thr + 6) > 0.05)
      fd.append("deesser_threshold", thr);
    const hi = parseFloat($("p-des-hi").value);
    if (hi && Math.abs(hi - 9000) > 1) fd.append("deesser_freq_hi", hi);
  }
  if ($("p-dyneq").checked) fd.append("dynamic_eq_enabled", "true");
  if ($("p-denoise").value) {
    fd.append("denoise_preset", $("p-denoise").value);
    const ds = parseFloat($("p-dn-str").value);
    if (ds && Math.abs(ds - 1) > 0.02) fd.append("denoise_strength", ds);
  }
  const ta = parseFloat($("p-ta").value);
  if (Math.abs(ta - 1) > 0.02) fd.append("transient_attack", ta);
  const pm = parseFloat($("p-pm").value);
  if (pm > 0) fd.append("parallel_mix", pm);
  if ($("p-tp").checked) {
    fd.append("true_peak_enabled", "true");
    const tp = parseFloat($("p-tp-db").value);
    if (!Number.isNaN(tp) && Math.abs(tp + 1) > 0.02)
      fd.append("true_peak_ceiling_db", tp);
  }
  const bl = $("p-blank").value;
  if (bl !== "") fd.append("auto_blank_sec", parseFloat(bl));
  if ($("p-vocal").checked) fd.append("apply_vocal_isolation", "true");
}

/* Output-format dependent bitrate choices (mirrors backend export caps). */
const BITRATES = { mp3: [320, 256, 192, 128], opus: [192, 128], aac: [192] };
function syncOutputControls() {
  const fmt = $("format").value;
  const bs = BITRATES[fmt];
  const sel = $("bitrate");
  if (bs) {
    sel.innerHTML = bs.map((b) => `<option value="${b}">${b} kbps</option>`)
      .join("");
    sel.classList.remove("hidden");
  } else sel.classList.add("hidden");
  $("target-lufs").classList.toggle("hidden", $("preset").value !== "custom");
}

async function submitMaster(url, extra) {
  if (!currentFile) return;
  const fd = new FormData();
  fd.append("file", currentFile);
  if ($("preset").value === "custom")
    fd.append("target_lufs", parseFloat($("target-lufs").value) || -14);
  else fd.append("preset", $("preset").value);
  fd.append("style", $("style").value || "standard");
  fd.append("out_format", $("format").value);
  if (!$("bitrate").classList.contains("hidden"))
    fd.append("bitrate", $("bitrate").value);
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
    $("daw-card").classList.add("hidden");
    resetPipe();
    watchProgress(d.job_id);
  } catch (e) {
    msg(T("Error: ") + e.message);
    maybeUpgradePrompt(e.message);
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
      updatePipe(d.progress || 0, d.message || "");
    }
    if (d.status === "done") {
      es.close();
      if (onDone) return onDone(null, d);
      $("bar").style.width = "100%";
      updatePipe(100, "done");
      $("done-row").classList.remove("hidden");
      $("btn-master").disabled = false;
      $("btn-auto").disabled = false;
      $("share-link").href = api(`/api/master/share/${jobId}`);
      if (d.before_lufs != null && d.after_lufs != null)
        $("lufs-delta").textContent =
          `${d.before_lufs} LUFS → ${d.after_lufs} LUFS`;
      onMasterDone(jobId, d);
    } else if (d.status === "error") {
      es.close();
      if (onDone) return onDone(d.error || "unknown", d);
      msg(T("Mastering failed: ") + (d.error || "unknown"), 8000);
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
      updatePipe(100, "done");
      $("done-row").classList.remove("hidden");
      $("btn-master").disabled = false;
      onMasterDone(jobId, d);
      return;
    }
    if (d.status === "error") {
      if (onDone) return onDone(d.error || "unknown", d);
      msg(T("Failed: ") + d.error, 8000);
      $("btn-master").disabled = false;
      return;
    }
    setTimeout(() => pollProgress(jobId, onDone), 700);
  } catch (e) { if (onDone) onDone(e.message, null); else msg(T("Lost job: ") + e.message); }
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
  if (typeof waveStop === "function") waveStop();  // one player at a time
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
    msg(T("Batch failed: ") + e.message, 8000);
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
  } catch (e) { msg(T("Analyze failed: ") + e.message); }
  $("btn-analyze").disabled = false;
});

let lastAnalysis = null;

function renderAnalysis(a) {
  lastAnalysis = a;
  if (currentFile) a.filename = currentFile.name;
  $("analysis").classList.remove("hidden");
  $("an-summary").innerHTML =
    `peak ${a.peak_dbfs} dBFS · ${a.duration_sec}s · ${a.sample_rate} Hz · ` +
    `${a.channels}ch`;
  setMeterVal(a.lufs);
  setCorrelation(a.stereo_correlation);
  specData = {
    mono: a.spectrum_bars || [],
    mid: a.spectrum_bars_mid || null,
    side: a.spectrum_bars_side || null,
  };
  renderSpectrumBars(specActive);
  drawLufsTimeline(a.lufs_timeline, a.timeline_step_sec, a.duration_sec);
  drawVectorscope(a.vectorscope_points);
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
  if (!f) { msg(T("Choose a file first")); return null; }
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
  } catch (e) { msg(T("Tool failed: ") + e.message); }
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
  } catch (e) { $("tool-out").textContent = ""; msg(T("Vocal isolation failed: ") + e.message, 8000); }
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
  } catch (e) { $("tool-out").textContent = ""; msg(T("Upscale failed: ") + e.message); }
});

$("btn-refmatch").addEventListener("click", async () => {
  const f = toolFile();
  const ref = $("ref-file").files[0];
  if (!f) return;
  if (!ref) return msg(T("Choose a reference track"));
  const fd = new FormData();
  fd.append("file", f);
  fd.append("reference", ref);
  fd.append("strength", $("ref-strength").value || "0.8");
  $("tool-out").textContent = "Matching the reference tonality…";
  try {
    const r = await jupload("/api/v2/reference-match", fd);
    await downloadResponse(r, "matched.wav");
    $("tool-out").textContent = "Reference-matched master downloaded.";
  } catch (e) { $("tool-out").textContent = ""; msg(T("Reference match failed: ") + e.message, 8000); }
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
    msg(T("AI failed: ") + e.message);
  }
});

$("btn-ai-config").addEventListener("click", async () => {
  const q = $("ai-q").value.trim();
  if (!q) return msg(T("Describe the sound you want first"));
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
  } catch (e) { $("ai-out").textContent = ""; msg(T("AI failed: ") + e.message); }
});

$("btn-ai-recommend").addEventListener("click", async () => {
  if (!currentFile) return msg(T("Choose a track first (top card)"));
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
  } catch (e) { $("ai-out").textContent = ""; msg(T("AI failed: ") + e.message); }
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

/* ======================================================================
   Studio visualizers & session UX (reference app.js feature parity:
   waveform player + fullscreen, client-side spectrum/vectorscope on load,
   LUFS meter/VU/correlation, LUFS timeline, DAW before/after comparison,
   pipeline step visualizer, local history, tier/limits UI, report export).
   All canvases read colors from CSS vars so they follow the theme.
   ====================================================================== */

/* ---------- decoded audio + waveform player ---------- */
let waveBuf = null;          // decoded AudioBuffer of the loaded file
let wavePlaying = false;
let waveSrc = null;          // active AudioBufferSourceNode
let waveStartT = 0;          // AudioContext time when playback started
let waveOffset = 0;          // paused position (sec)
let waveRaf = 0;

function waveCtx() {
  // reuse the A/B preview context — one AudioContext per page
  abCtx = abCtx || new (window.AudioContext || window.webkitAudioContext)();
  return abCtx;
}

async function loadWave(f) {
  try {
    waveStop();
    waveBuf = await waveCtx().decodeAudioData(await f.arrayBuffer());
  } catch (e) { waveBuf = null; return; } // codec the browser can't decode
  waveOffset = 0;
  $("wavebox").classList.remove("hidden");
  // peak scan for the meta pill
  let peak = 0;
  for (let c = 0; c < waveBuf.numberOfChannels; c++) {
    const d = waveBuf.getChannelData(c);
    for (let i = 0; i < d.length; i += 4) peak = Math.max(peak, Math.abs(d[i]));
  }
  $("wave-meta").textContent =
    `${(waveBuf.sampleRate / 1000).toFixed(1)} kHz · ` +
    `${waveBuf.numberOfChannels === 1 ? "mono" : "stereo"} · ` +
    `peak ${peak > 1e-9 ? (20 * Math.log10(peak)).toFixed(1) : "−∞"} dB`;
  $("t-total").textContent = fmtTime(waveBuf.duration);
  $("t-elapsed").textContent = "0:00";
  requestAnimationFrame(() => {
    drawWave($("wave"), waveBuf, 0);
    // instant local spectrum + vectorscope (backend analysis replaces
    // these with exact TPU-computed data when the user hits Analyze)
    $("analysis").classList.remove("hidden");
    specData = { mono: localSpectrumBars(waveBuf), mid: null, side: null };
    renderSpectrumBars("mono");
    drawVectorscope(localScopePoints(waveBuf));
  });
}

function wavePos() {
  return wavePlaying ? waveOffset + waveCtx().currentTime - waveStartT
                     : waveOffset;
}

function waveStop() {
  if (waveSrc) { try { waveSrc.stop(); } catch (e) {} waveSrc = null; }
  wavePlaying = false;
  cancelAnimationFrame(waveRaf);
  for (const id of ["btn-play", "btn-play-full"]) $(id).textContent = "▶";
}

function wavePlay() {
  if (!waveBuf) return;
  if (wavePlaying) {        // pause
    waveOffset = Math.min(wavePos(), waveBuf.duration);
    waveStop();
    return;
  }
  if (abAudio) { abAudio.pause(); stopScope(); }  // don't fight A/B preview
  const ctx = waveCtx();
  if (ctx.state === "suspended") ctx.resume();
  waveSrc = ctx.createBufferSource();
  waveSrc.buffer = waveBuf;
  waveSrc.connect(ctx.destination);
  if (waveOffset >= waveBuf.duration - 0.01) waveOffset = 0;
  waveSrc.start(0, waveOffset);
  waveStartT = ctx.currentTime;
  wavePlaying = true;
  waveSrc.onended = () => { if (wavePlaying) { waveOffset = 0; waveStop(); waveTick(); } };
  for (const id of ["btn-play", "btn-play-full"]) $(id).textContent = "❚❚";
  waveTick();
}

function waveTick() {
  const pos = Math.min(wavePos(), waveBuf ? waveBuf.duration : 0);
  const frac = waveBuf && waveBuf.duration > 0 ? pos / waveBuf.duration : 0;
  $("t-elapsed").textContent = fmtTime(pos);
  drawWave($("wave"), waveBuf, frac);
  const dlg = $("dlg-wave");
  if (dlg && dlg.open) {
    $("t-elapsed-full").textContent = fmtTime(pos);
    drawWave($("wave-full"), waveBuf, frac);
  }
  if (wavePlaying) waveRaf = requestAnimationFrame(waveTick);
}

function waveSeek(ev, canvas) {
  if (!waveBuf) return;
  const r = canvas.getBoundingClientRect();
  const frac = Math.max(0, Math.min(1, (ev.clientX - r.left) / r.width));
  waveOffset = frac * waveBuf.duration;
  if (wavePlaying) { waveStop(); wavePlay(); } else waveTick();
}

/* min/max column waveform with a played-portion highlight */
function drawWave(canvas, buf, frac) {
  if (!canvas || !buf) return;
  const dpr = window.devicePixelRatio || 1;
  const rect = canvas.getBoundingClientRect();
  const W = Math.max(1, Math.floor((rect.width || 600) * dpr));
  const H = Math.floor((parseInt(canvas.getAttribute("height")) || 92) * dpr);
  if (canvas.width !== W || canvas.height !== H) { canvas.width = W; canvas.height = H; }
  const g = canvas.getContext("2d");
  g.clearRect(0, 0, W, H);
  const mid = H / 2, n = buf.length, nc = buf.numberOfChannels;
  const spp = Math.max(1, Math.floor(n / W));
  const played = cssVar("--acc", "#7a5cff");
  const rest = cssVar("--dim", "#8c94aa");
  const playX = Math.floor((frac || 0) * W);
  const ch0 = buf.getChannelData(0);
  const ch1 = nc > 1 ? buf.getChannelData(1) : ch0;
  for (let x = 0; x < W; x++) {
    let lo = 0, hi = 0;
    const s0 = x * spp, s1 = Math.min(n, s0 + spp);
    for (let i = s0; i < s1; i += 2) {
      const v = (ch0[i] + ch1[i]) * 0.5;
      if (v > hi) hi = v; else if (v < lo) lo = v;
    }
    g.fillStyle = x <= playX ? played : rest;
    g.globalAlpha = x <= playX ? 0.95 : 0.55;
    const y0 = mid - hi * mid * 0.92, y1 = mid - lo * mid * 0.92;
    g.fillRect(x, y0, 1, Math.max(1, y1 - y0));
  }
  g.globalAlpha = 1;
  if (frac > 0) {
    g.fillStyle = cssVar("--acc2", "#60c8ff");
    g.fillRect(playX, 0, Math.max(1, dpr), H);
  }
}

$("btn-play").onclick = wavePlay;
$("btn-play-full").onclick = wavePlay;
$("wave").addEventListener("click", (e) => waveSeek(e, $("wave")));
$("wave-full").addEventListener("click", (e) => waveSeek(e, $("wave-full")));
$("wave-expand").onclick = () => {
  if (!waveBuf) return;
  $("dlg-wave").showModal();
  $("t-total-full").textContent = fmtTime(waveBuf.duration);
  requestAnimationFrame(waveTick);
};
$("dlg-wave-close").onclick = () => $("dlg-wave").close();

/* ---------- client-side spectrum / vectorscope at load ---------- */

/* iterative in-place radix-2 FFT (power-of-two n) */
function fftInPlace(re, im) {
  const n = re.length;
  for (let i = 1, j = 0; i < n; i++) {          // bit-reversal permutation
    let bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      let t = re[i]; re[i] = re[j]; re[j] = t;
      t = im[i]; im[i] = im[j]; im[j] = t;
    }
  }
  for (let len = 2; len <= n; len <<= 1) {
    const ang = -2 * Math.PI / len;
    const wr = Math.cos(ang), wi = Math.sin(ang);
    for (let i = 0; i < n; i += len) {
      let cr = 1, ci = 0;
      for (let k = 0; k < len / 2; k++) {
        const a = i + k, b = i + k + len / 2;
        const tr = re[b] * cr - im[b] * ci;
        const ti = re[b] * ci + im[b] * cr;
        re[b] = re[a] - tr; im[b] = im[a] - ti;
        re[a] += tr; im[a] += ti;
        const ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr; cr = ncr;
      }
    }
  }
}

/* 64 log-spaced bars (20 Hz – 20 kHz) from a Hann window at the midpoint —
   same shape the backend's exact analyzer returns, for instant feedback */
function localSpectrumBars(buf) {
  const NF = 4096, NB = 64, f0 = 20, f1 = 20000;
  const n = buf.length, nc = buf.numberOfChannels;
  const start = n >= NF ? (n >> 1) - (NF >> 1) : 0;
  const re = new Float32Array(NF), im = new Float32Array(NF);
  for (let i = 0; i < NF; i++) {
    let v = 0;
    if (start + i < n)
      for (let c = 0; c < nc; c++) v += buf.getChannelData(c)[start + i];
    re[i] = (v / nc) * 0.5 * (1 - Math.cos(2 * Math.PI * i / (NF - 1)));
  }
  fftInPlace(re, im);
  const nyq = buf.sampleRate / 2, bars = [];
  for (let b = 0; b < NB; b++) {
    const lo = f0 * Math.pow(f1 / f0, b / (NB - 1));
    const hi = f0 * Math.pow(f1 / f0, (b + 1) / (NB - 1));
    const k0 = Math.max(0, Math.floor(lo / nyq * (NF / 2)));
    const k1 = Math.min(NF / 2, Math.ceil(hi / nyq * (NF / 2)));
    let m = 0;
    for (let k = k0; k <= k1; k++)
      m = Math.max(m, Math.hypot(re[k], im[k]) * 2 / NF);
    bars.push(m > 1e-12 ? 20 * Math.log10(m) : -100);
  }
  return bars;
}

function localScopePoints(buf) {
  const MAX = 1200, n = buf.length;
  const ch0 = buf.getChannelData(0);
  const ch1 = buf.numberOfChannels > 1 ? buf.getChannelData(1) : ch0;
  const step = Math.max(1, Math.floor(n / MAX)), pts = [];
  for (let i = 0; i < n; i += step) pts.push([ch0[i], ch1[i]]);
  return pts;
}

/* ---------- analysis widgets ---------- */
let specData = { mono: [], mid: null, side: null };
let specActive = "mono";

function renderSpectrumBars(mode) {
  specActive = specData[mode] ? mode : "mono";
  document.querySelectorAll("#spec-tabs button").forEach((b) => {
    const on = b.dataset.spec === specActive;
    b.classList.toggle("active", on);
    b.disabled = !specData[b.dataset.spec] && b.dataset.spec !== "mono";
  });
  const bars = $("spectrum");
  bars.innerHTML = "";
  (specData[specActive] || []).forEach((db) => {
    const i = document.createElement("i");
    i.style.height = Math.max(2, (db + 80) / 80 * 90) + "px";
    bars.appendChild(i);
  });
}

document.querySelectorAll("#spec-tabs button").forEach((b) => {
  b.onclick = () => renderSpectrumBars(b.dataset.spec);
});

const VU_N = 24;
(function buildVu() {
  const vu = $("vu");
  for (let i = 0; i < VU_N; i++) vu.appendChild(document.createElement("i"));
})();

function setMeterVal(lufs) {
  const el = $("meter-val");
  const segs = $("vu").children;
  if (lufs == null || isNaN(lufs)) {
    el.textContent = "— LUFS"; el.className = "meter-val";
    for (const s of segs) s.className = "";
    return;
  }
  el.textContent = lufs.toFixed(1) + " LUFS";
  el.className = "meter-val " + (lufs > -9 ? "hot" : lufs > -14 ? "warn" : "good");
  const lit = Math.round(Math.min(1, Math.max(0, (lufs + 60) / 60)) * VU_N);
  for (let i = 0; i < VU_N; i++) {
    const pos = (i + 1) / VU_N;
    segs[i].className =
      i >= lit ? "" : pos < 0.72 ? "g" : pos < 0.88 ? "a" : "r";
  }
}

function setCorrelation(corr) {
  $("corr-line").textContent = (corr == null || isNaN(corr)) ? "" :
    `${T("L/R correlation")}: ${(+corr).toFixed(2)} (−1…+1)`;
}

function drawLufsTimeline(timeline, stepSec, durationSec) {
  const cv = $("lufs-timeline");
  if (!cv) return;
  const dpr = window.devicePixelRatio || 1;
  const rect = cv.getBoundingClientRect();
  const W = Math.max(1, Math.floor((rect.width || 400) * dpr));
  const H = Math.floor(64 * dpr);
  if (cv.width !== W || cv.height !== H) { cv.width = W; cv.height = H; }
  const g = cv.getContext("2d");
  g.clearRect(0, 0, W, H);
  if (!timeline || timeline.length < 2) return;
  const LMIN = -50, LMAX = 0;
  const step = stepSec || 0.4;
  const dur = durationSec > 0 ? durationSec : timeline.length * step;
  const pts = [];
  timeline.forEach((v, i) => {
    if (v == null || isNaN(v)) return;
    pts.push([
      (i * step / dur) * (W - 4) + 2,
      2 + (1 - Math.min(1, Math.max(0, (v - LMIN) / (LMAX - LMIN)))) * (H - 4),
    ]);
  });
  if (pts.length < 2) return;
  const acc = cssVar("--acc", "#7a5cff");
  g.beginPath();
  g.moveTo(pts[0][0], pts[0][1]);
  for (const [x, y] of pts.slice(1)) g.lineTo(x, y);
  g.lineTo(pts[pts.length - 1][0], H - 2);
  g.lineTo(pts[0][0], H - 2);
  g.closePath();
  g.globalAlpha = 0.18; g.fillStyle = acc; g.fill();
  g.globalAlpha = 1; g.strokeStyle = acc; g.lineWidth = Math.max(1, 1.5 * dpr);
  g.beginPath();
  g.moveTo(pts[0][0], pts[0][1]);
  for (const [x, y] of pts.slice(1)) g.lineTo(x, y);
  g.stroke();
}

function drawVectorscope(points) {
  const cv = $("vectorscope");
  if (!cv) return;
  const dpr = window.devicePixelRatio || 1;
  const S = Math.floor(180 * dpr);
  if (cv.width !== S || cv.height !== S) { cv.width = S; cv.height = S; }
  const g = cv.getContext("2d");
  g.clearRect(0, 0, S, S);
  const c = S / 2, r = c * 0.92;
  g.strokeStyle = cssVar("--line", "#2a2f4c");
  g.beginPath(); g.arc(c, c, r, 0, 2 * Math.PI); g.stroke();
  // ±45° mono/anti-phase guides
  g.beginPath();
  g.moveTo(c - r * 0.7, c + r * 0.7); g.lineTo(c + r * 0.7, c - r * 0.7);
  g.moveTo(c - r * 0.7, c - r * 0.7); g.lineTo(c + r * 0.7, c + r * 0.7);
  g.globalAlpha = 0.4; g.stroke(); g.globalAlpha = 1;
  if (!points || !points.length) return;
  g.fillStyle = cssVar("--acc", "#7a5cff");
  g.globalAlpha = 0.55;
  for (const [L, R] of points)
    g.fillRect(Math.floor(c + L * r), Math.floor(c - R * r), 2, 2);
  g.globalAlpha = 1;
}

/* ---------- analyze report export ---------- */
function analyzeReportText(a) {
  const L = [];
  L.push("Magic Master — " + T("Analysis report"));
  L.push("=".repeat(32), "");
  if (a.filename) L.push(T("File") + ": " + a.filename);
  L.push(T("Date") + ": " + new Date().toLocaleString(), "");
  L.push("--- " + T("Loudness") + " ---");
  if (a.lufs != null) L.push("Integrated LUFS: " + (+a.lufs).toFixed(2));
  if (a.peak_dbfs != null) L.push("Peak dBFS: " + (+a.peak_dbfs).toFixed(2));
  L.push("", "--- " + T("Metadata") + " ---");
  if (a.duration_sec != null) L.push(T("Duration") + ": " + fmtTime(a.duration_sec));
  if (a.sample_rate != null) L.push("Sample rate: " + a.sample_rate + " Hz");
  if (a.channels != null) L.push(T("Channels") + ": " + (a.channels === 1 ? "Mono" : "Stereo"));
  if (a.stereo_correlation != null)
    L.push(T("L/R correlation") + ": " + (+a.stereo_correlation).toFixed(4) + " (−1…+1)");
  const tl = a.lufs_timeline;
  if (Array.isArray(tl) && tl.length) {
    const mn = Math.min(...tl), mx = Math.max(...tl);
    const av = tl.reduce((s, v) => s + v, 0) / tl.length;
    L.push("", "--- " + T("Short-term LUFS") + " ---");
    L.push(`min ${mn.toFixed(2)} · max ${mx.toFixed(2)} · avg ${av.toFixed(2)}`);
    if (a.timeline_step_sec != null) L.push("step: " + a.timeline_step_sec + " s");
  }
  if (Array.isArray(a.spectrum_bars) && a.spectrum_bars.length) {
    L.push("", "--- " + T("Spectrum") + " ---");
    L.push(a.spectrum_bars.length + " log bars, 20 Hz – 20 kHz");
  }
  L.push("", "— Magic Master TPU");
  return L.join("\n");
}

function saveBlob(text, mime, name) {
  const a = document.createElement("a");
  a.href = URL.createObjectURL(new Blob([text], { type: mime }));
  a.download = name;
  a.click();
  URL.revokeObjectURL(a.href);
}

$("btn-report-txt").onclick = () => {
  if (!lastAnalysis) return msg(T("Run Analyze first"));
  const base = (lastAnalysis.filename || "report").replace(/\.[^.]+$/, "");
  saveBlob(analyzeReportText(lastAnalysis), "text/plain;charset=utf-8",
           base + "_analysis.txt");
};
$("btn-report-json").onclick = () => {
  if (!lastAnalysis) return msg(T("Run Analyze first"));
  const base = (lastAnalysis.filename || "report").replace(/\.[^.]+$/, "");
  saveBlob(JSON.stringify(lastAnalysis, null, 2),
           "application/json;charset=utf-8", base + "_analysis.json");
};

/* ---------- pipeline step visualizer ---------- */
/* engine stage labels arrive in SSE messages ("Mastering: chain:dynamics");
   map them (and the percent band as fallback) onto the step chips */
const PIPE_STEPS = [
  { step: "pre", to: 18, keys: ["load", "decode", "rumble", "denoise", "queued"] },
  { step: "eq", to: 34, keys: ["target_curve", "eq"] },
  { step: "deesser", to: 42, keys: ["deesser", "de-ess"] },
  { step: "dynamics", to: 62, keys: ["dynamics", "maximizer", "limiter", "compress"] },
  { step: "lufs", to: 74, keys: ["normalize", "lufs", "loudness"] },
  { step: "final", to: 90, keys: ["final", "style", "exciter", "imager", "fade", "transient", "true_peak"] },
  { step: "export", to: 100, keys: ["export", "encod", "dither", "done"] },
];

function resetPipe() {
  document.querySelectorAll("#pipe span").forEach((el) =>
    el.classList.remove("active", "done"));
}

function updatePipe(pct, message) {
  const m = (message || "").toLowerCase();
  let from = 0;
  for (const { step, to, keys } of PIPE_STEPS) {
    const el = document.querySelector(`#pipe [data-step="${step}"]`);
    if (!el) continue;
    const hit = keys.some((k) => m.includes(k));
    const done = pct >= to;
    el.classList.toggle("active", (hit || (pct >= from && pct < to)) && !done);
    el.classList.toggle("done", done);
    from = to;
  }
}

/* ---------- DAW before/after comparison ---------- */
let dawState = null;

async function fetchPreviewBuf(jobId, src) {
  const r = await fetch(api(`/api/master/preview/${jobId}?src=${src}`),
                        { headers: authHeaders() });
  if (!r.ok) throw new Error(String(r.status));
  return waveCtx().decodeAudioData(await r.arrayBuffer());
}

function drawDawLane(canvas, buf, color, hPx) {
  const dpr = window.devicePixelRatio || 1;
  const rect = canvas.getBoundingClientRect();
  const W = Math.max(1, Math.floor((rect.width || 600) * dpr));
  const H = Math.floor(hPx * dpr);
  if (canvas.width !== W || canvas.height !== H) { canvas.width = W; canvas.height = H; }
  const g = canvas.getContext("2d");
  g.clearRect(0, 0, W, H);
  drawWaveColumns(g, buf, W, H, color);
}

function drawWaveColumns(g, buf, W, H, color) {
  const mid = H / 2, n = buf.length, nc = buf.numberOfChannels;
  const spp = Math.max(1, Math.floor(n / W));
  const ch0 = buf.getChannelData(0);
  const ch1 = nc > 1 ? buf.getChannelData(1) : ch0;
  g.fillStyle = color;
  for (let x = 0; x < W; x++) {
    let amp = 0;
    const s0 = x * spp, s1 = Math.min(n, s0 + spp);
    for (let i = s0; i < s1; i += 2)
      amp = Math.max(amp, Math.abs(ch0[i] + ch1[i]) * 0.5);
    const h = Math.max(1, amp * mid * 0.92);
    g.globalAlpha = 0.25 + Math.min(0.7, amp * 0.65);
    g.fillRect(x, mid - h, 1, h * 2);
  }
  g.globalAlpha = 1;
}

function drawDawRuler(canvas, duration, hPx) {
  const dpr = window.devicePixelRatio || 1;
  const rect = canvas.getBoundingClientRect();
  const W = Math.max(1, Math.floor((rect.width || 600) * dpr));
  const H = Math.floor(hPx * dpr);
  if (canvas.width !== W || canvas.height !== H) { canvas.width = W; canvas.height = H; }
  const g = canvas.getContext("2d");
  g.clearRect(0, 0, W, H);
  if (!duration || duration <= 0) return;
  g.font = `${10 * dpr}px ui-monospace,monospace`;
  g.fillStyle = cssVar("--dim", "#8c94aa");
  g.textBaseline = "top";
  const step = duration <= 30 ? 5 : duration <= 120 ? 15 : duration <= 600 ? 30 : 60;
  for (let t = 0; t <= duration; t += step)
    g.fillText(fmtTime(t), (t / duration) * W + 3 * dpr, 2 * dpr);
}

function renderDaw(prefix, laneH, rulerH) {
  if (!dawState) return;
  const { a, b, lufsA, lufsB } = dawState;
  const dur = Math.max(a.duration, b.duration);
  drawDawRuler($(prefix + "-ruler"), dur, rulerH);
  drawDawLane($(prefix + "-a"), a, cssVar("--acc", "#7a5cff"), laneH);
  drawDawLane($(prefix + "-b"), b, cssVar("--ok", "#4ade80"), laneH);
  $(prefix + "-lufs-a").textContent = lufsA != null ? lufsA + " LUFS" : "—";
  $(prefix + "-lufs-b").textContent = lufsB != null ? lufsB + " LUFS" : "—";
}

async function onMasterDone(jobId, d) {
  saveHistory(d);
  refreshLimits();
  try {
    const [a, b] = await Promise.all([
      fetchPreviewBuf(jobId, "original"),
      fetchPreviewBuf(jobId, "mastered"),
    ]);
    dawState = { a, b, lufsA: d.before_lufs, lufsB: d.after_lufs };
    $("daw-card").classList.remove("hidden");
    requestAnimationFrame(() => renderDaw("daw", 52, 18));
  } catch (e) { /* previews unavailable — comparison card stays hidden */ }
}

$("daw-expand").onclick = () => {
  if (!dawState) return;
  $("dlg-daw").showModal();
  requestAnimationFrame(() => renderDaw("dawx", 100, 24));
};
$("dlg-daw-close").onclick = () => $("dlg-daw").close();

/* ---------- local mastering history ---------- */
const HIST_KEY = "mm_history", HIST_MAX = 20;

function getHistory() {
  try { return JSON.parse(localStorage.getItem(HIST_KEY) || "[]"); }
  catch (e) { return []; }
}

function saveHistory(d) {
  if (!currentFile) return;
  const h = getHistory();
  h.unshift({
    name: currentFile.name,
    size: fmtBytes(currentFile.size),
    fmt: ($("format").value || "wav").toUpperCase(),
    target: $("preset").value,
    before: d.before_lufs, after: d.after_lufs,
    date: new Date().toISOString().slice(0, 16).replace("T", " "),
  });
  if (h.length > HIST_MAX) h.length = HIST_MAX;
  try { localStorage.setItem(HIST_KEY, JSON.stringify(h)); } catch (e) {}
  renderHistory();
}

function renderHistory() {
  const h = getHistory();
  $("hist-count").textContent = h.length;
  const list = $("hist-list");
  if (!h.length) {
    list.innerHTML = `<div class="muted" data-i18n="No mastered files yet">${esc(T("No mastered files yet"))}</div>`;
    return;
  }
  list.innerHTML = h.map((e) => {
    const delta = e.after != null && e.before != null
      ? (e.after - e.before).toFixed(1) : null;
    return `<div class="hist-entry"><div><div>${esc(e.name)}</div>` +
      `<div class="sub">${esc(e.fmt || "WAV")} · ${esc(e.size || "")} · ${esc(e.target || "")}</div></div>` +
      `<div style="text-align:right"><div>${e.after != null ? (+e.after).toFixed(1) + " LUFS" : "—"}` +
      `${delta != null ? ` <span class="sub">(${delta > 0 ? "+" : ""}${delta} dB)</span>` : ""}</div>` +
      `<div class="sub">${esc(e.date || "")}</div></div></div>`;
  }).join("");
}

$("hist-head").onclick = () => $("hist-list").classList.toggle("hidden");
$("hist-clear").onclick = (e) => {
  e.stopPropagation();
  try { localStorage.removeItem(HIST_KEY); } catch (err) {}
  renderHistory();
  msg(T("History cleared"));
};
renderHistory();

/* ---------- tier / limits UI + upgrade prompts ---------- */
async function refreshLimits() {
  try {
    const d = await jget("/api/limits");
    const pill = $("tier-pill");
    const daily = d.daily_limit === -1 ? "∞" : d.daily_limit;
    pill.textContent =
      `${(d.tier || "free").toUpperCase()} · ${T("daily limit")}: ${daily}` +
      (d.tokens_balance != null ? ` · ${T("tokens")}: ${d.tokens_balance}` : "") +
      (d.priority_queue ? " · priority" : "");
    pill.classList.remove("hidden");
  } catch (e) { /* guest or API down: no pill */ }
}
refreshLimits();

function showUpgrade(title, body) {
  $("upgrade-title").textContent = title;
  $("upgrade-body").textContent = body;
  $("upgrade-register").classList.toggle("hidden", !!mmToken);
  const dlg = $("dlg-upgrade");
  if (!dlg.open) dlg.showModal();
}
$("dlg-upgrade-close").onclick = () => $("dlg-upgrade").close();

function maybeUpgradePrompt(errText) {
  const t = String(errText || "").toLowerCase();
  if (t.includes("limit") || t.includes("429") || t.includes("quota"))
    showUpgrade(T("Limit reached"),
                T("The free tier limit is used up. Pro and Studio get more daily masters, bigger uploads and the priority queue."));
}

/* one-time nudge for guests who master successfully */
if (!mmToken && !sessionStorage.getItem("mm_hinted")) {
  setTimeout(() => {
    if (mmToken || sessionStorage.getItem("mm_hinted")) return;
    sessionStorage.setItem("mm_hinted", "1");
    if (getHistory().length > 0)
      showUpgrade(T("Keep your masters"),
                  T("Create a free account to keep mastering history, save chain presets and raise upload limits."));
  }, 45000);
}

/* ---------- AI limits line ---------- */
async function loadAiLimits() {
  try {
    const d = await jget("/api/ai/limits");
    const rem = d.remaining === -1 || d.remaining == null ? "∞" : d.remaining;
    $("ai-limits").textContent =
      `${T("AI requests today")}: ${d.used ?? 0} / ${d.limit === -1 ? "∞" : d.limit} (${rem} ${T("left")})`;
  } catch (e) { /* guest */ }
}
loadAiLimits();

/* ---------- theme / resize repaint ---------- */
function repaintAll() {
  if (waveBuf) drawWave($("wave"), waveBuf,
    waveBuf.duration > 0 ? wavePos() / waveBuf.duration : 0);
  renderSpectrumBars(specActive);
  if (lastAnalysis) {
    drawLufsTimeline(lastAnalysis.lufs_timeline,
                     lastAnalysis.timeline_step_sec, lastAnalysis.duration_sec);
    drawVectorscope(lastAnalysis.vectorscope_points);
  } else if (waveBuf) drawVectorscope(localScopePoints(waveBuf));
  if (dawState && !$("daw-card").classList.contains("hidden"))
    renderDaw("daw", 52, 18);
}
window.addEventListener("mm-theme", repaintAll);
let _rsz = 0;
window.addEventListener("resize", () => {
  clearTimeout(_rsz);
  _rsz = setTimeout(repaintAll, 150);
});

/* ---------- output options + server-gated extensions ---------- */
$("format").addEventListener("change", syncOutputControls);
$("preset").addEventListener("change", syncOutputControls);
syncOutputControls();
(async () => {
  try {
    const ext = await jget("/api/extensions");
    if (ext.vocal_isolation) $("p-vocal-wrap").classList.remove("hidden");
  } catch (e) { /* guest / offline */ }
})();
