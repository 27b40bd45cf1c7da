/* Magic Master TPU — PWA service worker.
   Strategy (reference frontend/sw.js behavior, rewritten):
   - precache the app shell + offline fallback at install;
   - static assets (/static/*, pages): cache-first with background refresh;
   - /api/*: network only (never cache API responses — job state is live);
   - navigations: network-first, falling back to the cached shell when
     offline. */
"use strict";

const VERSION = "mm-v2";
const SHELL = [
  "/", "/app.js", "/manifest.json",
  "/static/mm.css", "/static/mm.js", "/static/icon.svg",
  "/lufs-analyzer", "/landing", "/404.html",
];

self.addEventListener("install", (e) => {
  e.waitUntil(
    caches.open(VERSION).then((c) => c.addAll(SHELL)).then(() => self.skipWaiting())
  );
});

self.addEventListener("activate", (e) => {
  e.waitUntil(
    caches.keys().then((keys) =>
      Promise.all(keys.filter((k) => k !== VERSION).map((k) => caches.delete(k)))
    ).then(() => self.clients.claim())
  );
});

self.addEventListener("fetch", (e) => {
  const url = new URL(e.request.url);
  if (e.request.method !== "GET" || url.origin !== location.origin) return;
  if (url.pathname.startsWith("/api/") || url.pathname.startsWith("/bot/")) return;

  if (url.pathname.startsWith("/static/") || url.pathname === "/app.js") {
    // cache-first + background refresh
    e.respondWith(
      caches.match(e.request).then((hit) => {
        const refresh = fetch(e.request).then((r) => {
          if (r.ok) caches.open(VERSION).then((c) => c.put(e.request, r.clone()));
          return r;
        }).catch(() => hit);
        return hit || refresh;
      })
    );
    return;
  }

  if (e.request.mode === "navigate") {
    e.respondWith(
      fetch(e.request).catch(() =>
        caches.match(e.request).then((hit) => hit || caches.match("/"))
      )
    );
  }
});
