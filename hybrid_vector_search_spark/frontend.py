"""Single-file browser client for the HTTP API — the reference's demo UI.

The reference ships a Flask-templated page plus a static script
(reference frontend/templates/index.html, frontend/static/js/main.js) that
drives the two endpoints: it fills a restaurant <select> from
``GET /api/restaurants``, posts ``{mode, limit, description?, title?,
available?, maxPrice?, restaurant?}`` to ``POST /api/search``, and renders
each result's product fields plus the mode-specific scores — for hybrid
mode it unpacks ``scoreDetails`` (combined ``value`` and the per-pipeline
``details`` entries named searchOne/searchTwo, falling back from ``value``
to ``inputPipelineRawScore``; main.js:104-151). This module reproduces that
observable behavior as one self-contained page (inline CSS/JS, no template
engine, no static directory) so the engine's HTTP surface is a complete
swap-in: same endpoints, same payloads, same score rendering.

The page renders BOTH hybrid wire shapes: the reference's ``scoreDetails``
(value + details[] as above) AND this engine's ``score_details``
({vector,text} branch structs from api._sanitize) — plus field fallbacks so
both a reference-shaped catalog (nested ``product`` struct) and a flat
engine-configured corpus render sensibly.
"""

from __future__ import annotations

INDEX_HTML = """<!DOCTYPE html>
<html lang="es">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>Hybrid Vector Search</title>
<style>
  :root { --ink: #1f2430; --line: #d8dce4; --accent: #2d5bd1; }
  body { font-family: system-ui, sans-serif; color: var(--ink); margin: 0;
         background: #f4f6fa; }
  main { max-width: 720px; margin: 2rem auto; padding: 0 1rem; }
  h1 { font-size: 1.5rem; }
  fieldset { border: 1px solid var(--line); border-radius: 8px;
             background: #fff; margin: 0 0 1rem; padding: 1rem; }
  legend { font-weight: 600; padding: 0 .4rem; }
  label { display: block; margin: .5rem 0 .2rem; }
  input[type=text], select { width: 100%; box-sizing: border-box;
    padding: .45rem; border: 1px solid var(--line); border-radius: 6px; }
  .row { display: flex; gap: .75rem; align-items: center; }
  .row input[type=range] { flex: 1; }
  .modes label { display: inline-flex; gap: .3rem; margin-right: 1rem; }
  button { background: var(--accent); color: #fff; border: 0;
           border-radius: 6px; padding: .5rem 1.2rem; cursor: pointer; }
  button.ghost { background: #fff; color: var(--accent);
                 border: 1px solid var(--accent); }
  .card { border: 1px solid var(--line); border-radius: 8px; background: #fff;
          padding: .8rem 1rem; margin: .6rem 0; }
  .card h3 { margin: 0 0 .3rem; }
  .scores { display: flex; flex-wrap: wrap; gap: .8rem; font-size: .85rem;
            color: #444; margin-top: .4rem; }
  .scores b { color: var(--ink); }
  #status { color: #8a1f1f; margin: .5rem 0; }
  .hidden { display: none; }
</style>
</head>
<body>
<main>
  <h1>Hybrid Vector Search</h1>

  <fieldset>
    <legend>Filtros</legend>
    <label><input type="checkbox" id="fAvailable"> Disponible</label>
    <label for="fPrice">Precio m&aacute;ximo (S/)</label>
    <div class="row">
      <button type="button" class="ghost" id="fPriceToggle">Habilitar</button>
      <input type="range" id="fPrice" min="1" max="20" value="10" disabled>
      <span id="fPriceShown">--</span>
    </div>
    <label for="fRestaurant">Restaurante</label>
    <select id="fRestaurant"><option value="">Todos</option></select>
  </fieldset>

  <fieldset>
    <legend>B&uacute;squeda</legend>
    <div class="modes">
      <label><input type="radio" name="mode" value="vector" checked> Vector</label>
      <label><input type="radio" name="mode" value="hybrid"> Hybrid (Score Fusion)</label>
      <label><input type="radio" name="mode" value="fulltext"> Full Text</label>
    </div>
    <label for="qTitle">T&iacute;tulo (texto completo)</label>
    <input type="text" id="qTitle" autocomplete="off">
    <label for="qDesc">Descripci&oacute;n</label>
    <div class="row">
      <input type="text" id="qDesc" autocomplete="off">
      <button type="button" id="go">Buscar</button>
    </div>
  </fieldset>

  <div id="status" class="hidden"></div>
  <section id="out"></section>
</main>
<script>
"use strict";
const $ = (id) => document.getElementById(id);
let priceOn = false;

$("fPriceToggle").onclick = () => {
  priceOn = !priceOn;
  $("fPrice").disabled = !priceOn;
  $("fPriceToggle").textContent = priceOn ? "Deshabilitar" : "Habilitar";
  $("fPriceShown").textContent = priceOn ? $("fPrice").value : "--";
};
$("fPrice").oninput = () => { $("fPriceShown").textContent = $("fPrice").value; };

fetch("/api/restaurants").then((r) => {
  if (!r.ok) throw new Error("restaurants " + r.status);
  return r.json();
}).then((names) => {
  for (const n of names) {
    const o = document.createElement("option");
    o.value = o.textContent = n;
    $("fRestaurant").append(o);
  }
}).catch((e) => console.error(e));

// Hybrid score unpacking handles BOTH wire shapes:
// - the reference's Atlas shape (main.js:104-151): scoreDetails.value is the
//   combined score; per-pipeline entries live in scoreDetails.details keyed
//   by inputPipelineName (searchOne = vector, searchTwo = text), each scored
//   by its `value` with `inputPipelineRawScore` as the fallback;
// - this engine's shape (api._sanitize): score_details = {vector: {raw,
//   normalized, weight}, text: {...}} with the combined score in `score`.
function pipelineScore(details, name) {
  const d = (details || []).find(
    (x) => (x.inputPipelineName || "").toLowerCase() === name
  );
  if (!d) return null;
  if (typeof d.value === "number") return d.value;
  if (typeof d.inputPipelineRawScore === "number") return d.inputPipelineRawScore;
  return null;
}

function branchScore(branch) {
  if (!branch) return null;
  if (typeof branch.raw === "number") return branch.raw;
  if (typeof branch.normalized === "number") return branch.normalized;
  return null;
}

function scoreBits(item, mode) {
  const bits = [];
  const add = (k, v) => {
    if (v !== null && v !== undefined)
      bits.push(`<span><b>${k}:</b> ${Number(v).toFixed(4)}</span>`);
  };
  if (mode === "hybrid" && item.scoreDetails) {
    add("Score combinado", typeof item.scoreDetails.value === "number"
        ? item.scoreDetails.value : null);
    add("Score vector", pipelineScore(item.scoreDetails.details, "searchone"));
    add("Score texto", pipelineScore(item.scoreDetails.details, "searchtwo"));
  } else if (mode === "hybrid" && item.score_details) {
    add("Score combinado", typeof item.score === "number" ? item.score : null);
    add("Score vector", branchScore(item.score_details.vector));
    add("Score texto", branchScore(item.score_details.text));
  } else if (typeof item.score === "number") {
    add(mode === "fulltext" ? "Score texto" : "Score vector", item.score);
  }
  return bits.join("");
}

function esc(s) {
  const d = document.createElement("div");
  d.textContent = s == null ? "" : String(s);
  return d.innerHTML;
}

function render(items, mode, message) {
  const out = $("out");
  out.innerHTML = "";
  const status = $("status");
  status.classList.add("hidden");
  if (!items.length) {
    status.textContent = message || "No se encontraron resultados.";
    status.classList.remove("hidden");
    return;
  }
  for (const it of items) {
    // field fallbacks: reference catalog docs carry a nested `product`
    // struct + restaurantName; an engine-configured corpus is flat (title/
    // text/source/...). Render whichever exists, hide what doesn't.
    const name = it.product?.name ?? it.name ?? it.title ?? it.text
      ?? "Producto sin nombre";
    const desc = it.product?.description ?? it.description;
    const restaurant = it.restaurantName ?? it.source;
    const amount = it.product?.price?.amount ?? it.price;
    const available = it.product?.available ?? it.available;
    const card = document.createElement("article");
    card.className = "card";
    card.innerHTML =
      `<h3>${esc(name)}</h3>` +
      (it.title && it.title !== name ? `<p><i>${esc(it.title)}</i></p>` : "") +
      (desc ? `<p>${esc(desc)}</p>` : "") +
      `<div class="scores">` +
      (restaurant ? `<span><b>Restaurante:</b> ${esc(restaurant)}</span>` : "") +
      (available !== undefined
        ? `<span><b>Disponible:</b> ${available ? "Sí" : "No"}</span>` : "") +
      (amount !== undefined
        ? `<span><b>Precio:</b> S/${Number(amount).toFixed(2)}</span>` : "") +
      scoreBits(it, mode) +
      `</div>`;
    out.append(card);
  }
}

$("go").onclick = () => {
  const mode = document.querySelector('input[name="mode"]:checked').value;
  const title = $("qTitle").value.trim();
  const desc = $("qDesc").value.trim();
  if (mode !== "fulltext" && !desc) {
    render([], mode, "La descripción es obligatoria para la búsqueda vectorial o híbrida.");
    return;
  }
  if (mode === "fulltext" && !title) {
    render([], mode, "El título es obligatorio para la búsqueda full text.");
    return;
  }
  const payload = { mode, limit: 5 };
  if (mode !== "fulltext") payload.description = desc;
  if (mode !== "vector") payload.title = title;
  if ($("fAvailable").checked) payload.available = true;
  if (priceOn) payload.maxPrice = Number($("fPrice").value);
  if ($("fRestaurant").value) payload.restaurant = $("fRestaurant").value;

  fetch("/api/search", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(payload),
  }).then((r) =>
    r.json().then((body) => {
      if (!r.ok) throw new Error(body.message || "Error al buscar resultados.");
      render(body.results ?? [], body.mode ?? mode);
    })
  ).catch((e) => render([], mode, e.message));
};
</script>
</body>
</html>
"""
