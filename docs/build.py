"""Build the documentation site: markdown -> static HTML.

The reference ships a Sphinx site built in CI (ref: docs/conf.py,
.github/workflows/build-docs.yml).  This repo's docs are plain Markdown;
this builder turns them into a navigable static site using only libraries
baked into the runtime image (`markdown` + `pygments`) so the build is
testable locally and in CI without pip installs.

    python docs/build.py [--out docs/_site]

Every ``docs/**/*.md`` page becomes an ``.html`` page with the sidebar
navigation parsed from ``index.md`` (the single source of truth for the doc
tree), intra-doc ``.md`` links rewritten to ``.html``, and fenced code
blocks highlighted.
"""
from __future__ import annotations

import argparse
import ast
import os
import re
import shutil

DOCS_DIR = os.path.dirname(os.path.abspath(__file__))
PACKAGE_DIR = os.path.join(os.path.dirname(DOCS_DIR), "tetris_gymnasium_tpu")

PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — tetris-gymnasium-tpu</title>
<style>
:root {{ --fg:#1a1a1a; --bg:#ffffff; --accent:#0b5fff; --side:#f6f8fa; }}
* {{ box-sizing: border-box; }}
body {{ margin:0; font:16px/1.6 system-ui,-apple-system,Segoe UI,sans-serif;
       color:var(--fg); background:var(--bg); display:flex; min-height:100vh; }}
nav {{ width:290px; flex:none; background:var(--side); padding:24px 18px;
      border-right:1px solid #e1e4e8; font-size:14px; }}
nav h1 {{ font-size:15px; margin:0 0 12px; }}
nav ul {{ list-style:none; padding-left:14px; margin:4px 0; }}
nav > ul {{ padding-left:0; }}
nav li {{ margin:2px 0; }}
nav a {{ color:var(--fg); text-decoration:none; }}
nav a:hover, nav a.current {{ color:var(--accent); }}
main {{ flex:1; max-width:860px; padding:32px 48px 64px; }}
pre {{ background:#f6f8fa; padding:12px 16px; border-radius:6px; overflow-x:auto;
      font-size:13.5px; line-height:1.45; }}
code {{ font-family:ui-monospace,SFMono-Regular,Menlo,monospace; font-size:0.92em; }}
p > code, li > code, td > code {{ background:#f0f1f3; padding:1px 5px; border-radius:4px; }}
table {{ border-collapse:collapse; margin:16px 0; }}
th, td {{ border:1px solid #d0d7de; padding:6px 12px; text-align:left; }}
th {{ background:var(--side); }}
h1,h2,h3 {{ line-height:1.25; }}
a {{ color:var(--accent); }}
{pygments_css}
</style>
</head>
<body>
<nav>
<h1><a href="{root}index.html">tetris-gymnasium-tpu</a></h1>
{nav}
</nav>
<main>
{body}
</main>
</body>
</html>
"""


def md_converter():
    import markdown

    return markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )


def pygments_css() -> str:
    from pygments.formatters import HtmlFormatter

    return HtmlFormatter(style="default").get_style_defs(".codehilite")


def find_pages() -> list[str]:
    pages = []
    for root, dirs, files in os.walk(DOCS_DIR):
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        for f in sorted(files):
            if f.endswith(".md"):
                pages.append(os.path.relpath(os.path.join(root, f), DOCS_DIR))
    return pages


def rewrite_links(html: str, depth: int) -> str:
    """Point intra-doc .md hrefs at the generated .html files."""
    def sub(m):
        href = m.group(1)
        if href.startswith(("http://", "https://", "#", "mailto:")):
            return m.group(0)
        rewritten = re.sub(r"\.md(#|$)", r".html\1", href)
        return f'href="{rewritten}"'

    return re.sub(r'href="([^"]+)"', sub, html)


def build_nav(conv, current: str) -> str:
    """Sidebar = the nested list from index.md, links made root-relative."""
    with open(os.path.join(DOCS_DIR, "index.md")) as f:
        text = f.read()
    # keep only the list body of index.md
    lines = [l for l in text.splitlines() if l.lstrip().startswith("- ")]
    conv.reset()
    html = conv.convert("\n".join(lines))
    html = re.sub(r"\.md(#|\")", r".html\1", html)
    cur = current[:-3] + ".html"
    html = html.replace(f'href="{cur}"', f'href="{cur}" class="current"')
    return html


def _first_paragraph(doc: str | None) -> str:
    if not doc:
        return ""
    para = doc.strip().split("\n\n")[0].replace("\n", " ")
    return para.replace("|", "\\|")  # keep markdown table cells intact


def _signature(node) -> str:
    a = node.args
    parts = [arg.arg for arg in a.posonlyargs + a.args]
    n_defaults = len(a.defaults)
    for i in range(n_defaults):
        parts[len(parts) - n_defaults + i] += "=…"
    if a.vararg:
        parts.append("*" + a.vararg.arg)
    if a.kwonlyargs:
        if not a.vararg:
            parts.append("*")
        parts += [k.arg + ("=…" if d else "") for k, d in zip(a.kwonlyargs, a.kw_defaults)]
    if a.kwarg:
        parts.append("**" + a.kwarg.arg)
    return f"({', '.join(parts)})"


def generate_api_page() -> str:
    """API reference markdown from the package SOURCE (ast — no imports, so
    the docs build needs neither jax nor the package installed)."""
    sections = []
    for root, dirs, files in os.walk(PACKAGE_DIR):
        dirs[:] = sorted(d for d in dirs if not d.startswith("__"))
        for f in sorted(files):
            if not f.endswith(".py") or f == "__init__.py":
                continue
            path = os.path.join(root, f)
            mod = os.path.relpath(path, os.path.dirname(PACKAGE_DIR))[:-3].replace(
                os.sep, "."
            )
            tree = ast.parse(open(path).read())
            lines = [f"## `{mod}`", "", _first_paragraph(ast.get_docstring(tree)), ""]
            rows = []
            for node in tree.body:
                if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
                    rows.append(
                        f"| `class {node.name}` | "
                        f"{_first_paragraph(ast.get_docstring(node))} |"
                    )
                elif isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef)
                ) and not node.name.startswith("_"):
                    rows.append(
                        f"| `{node.name}{_signature(node)}` | "
                        f"{_first_paragraph(ast.get_docstring(node))} |"
                    )
            if rows:
                lines += ["| symbol | summary |", "|---|---|"] + rows + [""]
            sections.append("\n".join(lines))
    return (
        "# API reference\n\nGenerated from source docstrings by `docs/build.py` "
        "(every public symbol of every module).\n\n" + "\n".join(sections)
    )


def build(out_dir: str) -> int:
    conv = md_converter()
    css = pygments_css()
    pages = find_pages()
    os.makedirs(out_dir, exist_ok=True)
    for rel in pages:
        with open(os.path.join(DOCS_DIR, rel)) as f:
            text = f.read()
        conv.reset()
        body = rewrite_links(conv.convert(text), rel.count(os.sep))
        m = re.search(r"<h1[^>]*>(.*?)</h1>", body)
        title = re.sub(r"<[^>]+>", "", m.group(1)) if m else rel
        depth = rel.count(os.sep)
        root = "../" * depth
        nav = build_nav(conv, rel)
        if depth:
            nav = re.sub(r'href="(?!https?://|#)', f'href="{root}', nav)
        page = PAGE.format(
            title=title, body=body, nav=nav, root=root, pygments_css=css
        )
        dest = os.path.join(out_dir, rel[:-3] + ".html")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "w") as f:
            f.write(page)

    # generated API reference (source-derived, no .md file on disk)
    conv.reset()
    body = rewrite_links(conv.convert(generate_api_page()), 0)
    page = PAGE.format(
        title="API reference",
        body=body,
        nav=build_nav(conv, "api.md"),
        root="",
        pygments_css=css,
    )
    with open(os.path.join(out_dir, "api.html"), "w") as f:
        f.write(page)
    return len(pages) + 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(DOCS_DIR, "_site"))
    p.add_argument("--clean", action="store_true")
    args = p.parse_args()
    if args.clean and os.path.isdir(args.out):
        shutil.rmtree(args.out)
    n = build(args.out)
    print(f"built {n} pages -> {args.out}")


if __name__ == "__main__":
    main()
