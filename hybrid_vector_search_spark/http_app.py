"""Thin HTTP binding for ``api.SearchEngine`` — the reference's Flask surface.

The reference serves its engine through a Flask blueprint
(``/root/reference/app.py:14-47``, ``/root/reference/backend/api.py:84-291``):
``GET /api/restaurants`` returns the distinct-values pipeline as a JSON list,
``POST /api/search`` returns ``{"mode": ..., "results": [...]}`` or a
``{"message": ...}`` error body with a 400/500 status. ``SearchEngine``
already reproduces that contract (including the Spanish 400 messages);
this module only binds it to routes — no engine logic lives here, which is
exactly how the reference splits ``app.py`` from ``backend/api.py``.

Flask is optional in this environment, so the import is deferred into
``create_app``; everything else in the package works without it.
"""

from __future__ import annotations

from .api import ApiError, SearchEngine


def create_app(engine: SearchEngine):
    """Build the Flask app serving ``engine``. Raises ImportError if Flask
    is unavailable (the engine itself never needs it)."""
    from flask import Flask, jsonify, request

    app = Flask(__name__)

    @app.route("/", methods=["GET"])
    def index():
        # the reference's browser client (frontend/templates/index.html +
        # static/js/main.js) rebuilt as one inline page — see frontend.py
        from .frontend import INDEX_HTML

        return INDEX_HTML, 200, {"Content-Type": "text/html; charset=utf-8"}

    @app.route("/api/restaurants", methods=["GET"])
    def list_restaurants():
        # reference backend/api.py:84-95: the $group/$match/$sort pipeline,
        # wrapped in the same 500-on-failure envelope
        try:
            return jsonify(engine.restaurants())
        except Exception as exc:  # pragma: no cover - engine failure path
            return jsonify({"message": f"No fue posible obtener los restaurantes: {exc}"}), 500

    @app.route("/api/search", methods=["POST"])
    def search_products():
        payload = request.get_json(silent=True)
        try:
            # ?compat=atlas re-shapes hybrid results into the reference's
            # exact scoreDetails wire document (api._atlas_score_details);
            # unset → the engine-level default
            return jsonify(engine.search(payload, compat=request.args.get("compat")))
        except ApiError as err:
            # the validation contract: status + Spanish message pass through
            return jsonify({"message": err.message}), err.status
        except Exception as exc:
            # reference backend/api.py:289
            return jsonify({"message": f"No fue posible ejecutar la búsqueda: {exc}"}), 500

    return app


def serve(engine: SearchEngine, *, host: str = "127.0.0.1", port: int = 5000) -> None:
    """Run the development server (reference app.py:51-53)."""
    create_app(engine).run(host=host, port=port)
