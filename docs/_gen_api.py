"""Regenerate docs/api/*.md by introspecting the package (CPU).

One page per section, mirroring the reference docs tree
(/root/reference/docs/source/*.rst). Run: python docs/_gen_api.py
"""
import jax

jax.config.update("jax_platforms", "cpu")
import importlib
import inspect
import os

SECTIONS = {
    "module": ("gpytorch_tpu.core.module", ["Module"]),
    "models": ("gpytorch_tpu.models", None),
    "likelihoods": ("gpytorch_tpu.likelihoods", None),
    "kernels": ("gpytorch_tpu.kernels", None),
    "keops_kernels": ("gpytorch_tpu.kernels.keops", None),
    "means": ("gpytorch_tpu.means", None),
    "marginal_log_likelihoods": ("gpytorch_tpu.mlls", None),
    "metrics": ("gpytorch_tpu.metrics", None),
    "constraints": ("gpytorch_tpu.constraints", None),
    "distributions": ("gpytorch_tpu.distributions", None),
    "priors": ("gpytorch_tpu.priors", None),
    "variational": ("gpytorch_tpu.variational", None),
    "optim": ("gpytorch_tpu.optim", None),
    "functions": ("gpytorch_tpu.functions", None),
    "utils": ("gpytorch_tpu.utils", None),
    "settings": ("gpytorch_tpu.settings", None),
    "beta_features": ("gpytorch_tpu.beta_features", None),
    "linear_operator": ("gpytorch_tpu.linop", None),
    "solvers": ("gpytorch_tpu.solvers", None),
    "distributed": ("gpytorch_tpu.distributed", None),
}


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "api"), exist_ok=True)
    index_rows = []
    for section, (modname, only) in SECTIONS.items():
        mod = importlib.import_module(modname)
        names = only or [
            n for n in (getattr(mod, "__all__", None) or sorted(vars(mod))) if not n.startswith("_")
        ]
        lines = [f"# {section}", "", f"`{modname}`", ""]
        doc = inspect.getdoc(mod)
        if doc:
            lines += [doc.split("\n\n")[0], ""]
        count = 0
        for n in names:
            obj = getattr(mod, n, None)
            if obj is None or inspect.ismodule(obj):
                continue
            kind = "class" if inspect.isclass(obj) else ("function" if callable(obj) else "object")
            d = inspect.getdoc(obj) or ""
            lines.append(f"- **`{n}`** ({kind}) — {d.split(chr(10))[0] if d else ''}")
            count += 1
        lines.append("")
        with open(os.path.join(here, "api", f"{section}.md"), "w") as f:
            f.write("\n".join(lines))
        index_rows.append((section, modname, count))
    with open(os.path.join(here, "api", "README.md"), "w") as f:
        f.write(
            "# API reference\n\nOne page per section, mirroring the reference docs tree "
            "(`/root/reference/docs/source/*.rst`). Regenerate with `python docs/_gen_api.py`.\n\n"
        )
        f.write("| Section | Module | Public names |\n|---|---|---|\n")
        for s, m, c in index_rows:
            f.write(f"| [{s}]({s}.md) | `{m}` | {c} |\n")


if __name__ == "__main__":
    main()
