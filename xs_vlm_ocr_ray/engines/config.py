"""Config model: providers, models (engines), prompt templates.

Ray-native restatement of the reference's config surface
(src/utils/ConfigManager.h:12-32, src/utils/ConfigManager.cpp:14-171):

- ``ProviderConfig`` / ``ModelConfig`` / ``PromptTemplate`` dataclasses
  mirror the reference rows (ModelAdapter.h:9-19, ConfigManager.h:12-32);
- ``load_config`` / ``save_config`` are the S5 reader / K8 writer (JSON,
  schema-on-read with typed errors, never exceptions mid-pipeline);
- ``resolve_provider_params`` is the T7/J1 broadcast small-dim join: a
  model inherits ``api_key`` / ``api_host`` from its provider iff unset
  (src/utils/ConfigManager.cpp:192-207) — resolved driver-side at
  pipeline build, never shipped per batch;
- ``default_prompt`` is the M4 prompt-defaulting rule
  (src/adapters/QwenAdapter.cpp:235-237): empty prompt → default chosen
  by payload presence;
- ``group_templates`` is the A5 two-level (type → category) grouping
  (src/ui/MainWindow.cpp:2421-2438).

Everything here is driver-side, config-scale data (dozens of rows) —
exactly like the reference, it never enters the distributed plan except
as resolved constructor kwargs for the engine actor pools.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field


class EngineConfigError(ValueError):
    """Typed config error (the reference emits configError signals with
    a message, src/utils/ConfigManager.cpp:30-47)."""


# M4 defaults (src/adapters/QwenAdapter.cpp:235-237 and clones).
DEFAULT_PROMPT_WITH_PAYLOAD = "recognize all text in the document"
DEFAULT_PROMPT_TEXT_ONLY = "answer the question"


@dataclass
class ProviderConfig:
    id: str
    name: str = ""
    api_key: str = ""
    api_host: str = ""
    description: str = ""


@dataclass
class ModelConfig:
    id: str
    display_name: str = ""
    type: str = "local"  # local | online (ModelAdapter.h:12)
    engine: str = "local_html"
    provider: str = ""
    params: dict[str, str] = field(default_factory=dict)
    enabled: bool = True


@dataclass
class PromptTemplate:
    name: str
    content: str
    type: str = "general"
    category: str = "default"


@dataclass
class EngineSettings:
    """Pipeline-level knobs (the reference's settings map +
    kMaxBatchConcurrent, src/ui/MainWindow.h:226)."""

    max_history: int = 50
    batch_size: int = 512
    concurrency: int | None = None
    row_timeout_ms: int = 60_000  # reference HTTP timeout (QwenAdapter.cpp:329)


@dataclass
class EngineConfig:
    providers: dict[str, ProviderConfig] = field(default_factory=dict)
    models: list[ModelConfig] = field(default_factory=list)
    templates: list[PromptTemplate] = field(default_factory=list)
    settings: EngineSettings = field(default_factory=EngineSettings)


def default_config() -> EngineConfig:
    """Built-in config analogous to the shipped models_config.json:
    one local engine, one stub online engine behind a provider."""
    return EngineConfig(
        providers={
            "stubcloud": ProviderConfig(
                id="stubcloud",
                name="Stub Cloud",
                api_key="sk-stub",
                api_host="https://stub.invalid",
                description="deterministic offline stand-in for online providers",
            )
        },
        models=[
            ModelConfig(id="local-html", display_name="Local HTML", type="local",
                        engine="local_html"),
            ModelConfig(id="stub-vlm", display_name="Stub VLM", type="online",
                        engine="stub_vlm", provider="stubcloud",
                        params={"temperature": "0.1"}),
        ],
        templates=[
            PromptTemplate("general", DEFAULT_PROMPT_WITH_PAYLOAD, "extract", "general"),
            PromptTemplate("qa", DEFAULT_PROMPT_TEXT_ONLY, "chat", "general"),
            PromptTemplate("table", "extract tables as markdown", "extract", "table"),
        ],
    )


def load_config(path: str) -> EngineConfig:
    """S5: JSON → typed config with per-field validation."""
    try:
        with open(path, encoding="utf-8") as f:
            raw = json.load(f)
    except (OSError, json.JSONDecodeError) as exc:
        raise EngineConfigError(f"cannot read config {path}: {exc}") from exc
    if not isinstance(raw, dict):
        raise EngineConfigError("config root must be an object")
    providers = {}
    for p in raw.get("providers", []):
        if "id" not in p:
            raise EngineConfigError("provider missing id")
        providers[p["id"]] = ProviderConfig(**{
            k: p.get(k, "") for k in ("id", "name", "api_key", "api_host", "description")
        })
    models = []
    for m in raw.get("models", []):
        if "id" not in m:
            raise EngineConfigError("model missing id")
        models.append(ModelConfig(
            id=m["id"],
            display_name=m.get("display_name", m["id"]),
            type=m.get("type", "local"),
            engine=m.get("engine", "local_html"),
            provider=m.get("provider", ""),
            params={str(k): str(v) for k, v in m.get("params", {}).items()},
            enabled=bool(m.get("enabled", True)),
        ))
    templates = [
        PromptTemplate(
            name=t.get("name", ""),
            content=t.get("content", ""),
            type=t.get("type", "general"),
            category=t.get("category", "default"),
        )
        for t in raw.get("templates", [])
    ]
    s = raw.get("settings", {})
    settings = EngineSettings(
        max_history=int(s.get("max_history", 50)),
        batch_size=int(s.get("batch_size", 512)),
        concurrency=s.get("concurrency"),
        row_timeout_ms=int(s.get("row_timeout_ms", 60_000)),
    )
    return EngineConfig(providers=providers, models=models, templates=templates,
                        settings=settings)


def save_config(cfg: EngineConfig, path: str) -> None:
    """K8: atomic JSON writer (temp + rename, like the manifest)."""
    doc = {
        "providers": [asdict(p) for p in cfg.providers.values()],
        "models": [asdict(m) for m in cfg.models],
        "templates": [asdict(t) for t in cfg.templates],
        "settings": asdict(cfg.settings),
    }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(doc, f, ensure_ascii=False, indent=2, sort_keys=True)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


class ConfigWatcher:
    """T8: hot config reload between pipeline waves.

    The reference's ConfigManager emits ``configChanged`` when the
    settings dialog saves, and the next submission picks the new config
    up (src/utils/ConfigManager.cpp:30-47 + MainWindow's reload slots).
    A streaming-batch engine has the same natural reload point: between
    waves. ``poll()`` re-stats the file and reloads iff (mtime, size)
    changed — call it before building each wave's actor pools; the new
    engine kwargs apply to every subsequent wave without restarting the
    driver. Errors during reload keep the last good config (a broken
    half-written file must never take down a running job) and are
    reported in the return value."""

    def __init__(self, path: str):
        self.path = path
        self._stamp: tuple[int, int] | None = None
        self.config: EngineConfig | None = None
        self.last_error: str = ""
        self.poll()

    def _stat(self) -> tuple[float, int] | None:
        try:
            st = os.stat(self.path)
        except OSError:
            return None
        # nanosecond mtime: same-second rewrites still change the stamp
        return (st.st_mtime_ns, st.st_size)

    def poll(self) -> bool:
        """Reload if the file changed; returns True iff a NEW config was
        loaded. Keeps the previous config on read/parse errors."""
        stamp = self._stat()
        if stamp is None:
            if self.config is None:
                # never-loaded AND unreadable: record why, for callers
                # that surface the failure (e.g. the CLI)
                self.last_error = f"cannot stat {self.path}"
            return False
        if stamp == self._stamp:
            return False
        try:
            cfg = load_config(self.path)
        except Exception as exc:  # noqa: BLE001 — reload must NEVER kill
            # the running job: load_config raises EngineConfigError for
            # unreadable/invalid-JSON files but raw TypeError/KeyError/
            # AttributeError for wrong-TYPED valid-JSON fields (e.g.
            # {"settings": {"max_history": null}}); either way the
            # contract is "keep the last good config"
            self.last_error = f"{type(exc).__name__}: {exc}"
            self._stamp = stamp  # don't re-parse the same broken bytes
            return False
        self.config = cfg
        self.last_error = ""
        self._stamp = stamp
        return True


def resolve_provider_params(model: ModelConfig, providers: dict[str, ProviderConfig]) -> dict[str, str]:
    """T7/J1: model params with api_key/api_host inherited from the
    provider iff unset on the model (ConfigManager.cpp:192-207).
    Null-filling semantics: a missing provider contributes nothing."""
    params = dict(model.params)
    prov = providers.get(model.provider)
    if prov is not None:
        if not params.get("api_key") and prov.api_key:
            params["api_key"] = prov.api_key
        if not params.get("api_host") and prov.api_host:
            params["api_host"] = prov.api_host
    return params


def default_prompt(prompt: str, has_payload: bool) -> str:
    """M4: empty prompt → default by payload presence."""
    if prompt:
        return prompt
    return DEFAULT_PROMPT_WITH_PAYLOAD if has_payload else DEFAULT_PROMPT_TEXT_ONLY


def group_templates(templates: list[PromptTemplate]) -> dict[str, dict[str, list[PromptTemplate]]]:
    """A5: two-level grouping type → category → templates, insertion
    order preserved (src/ui/MainWindow.cpp:2421-2438)."""
    out: dict[str, dict[str, list[PromptTemplate]]] = {}
    for t in templates:
        out.setdefault(t.type, {}).setdefault(t.category, []).append(t)
    return out
