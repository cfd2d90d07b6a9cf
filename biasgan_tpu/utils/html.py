"""Minimal HTML result pages (reference util/html.py's dominate pages [K];
dominate is not installed here, so this writes plain HTML directly)."""

from __future__ import annotations

import os
from typing import List


class HTML:
    def __init__(self, web_dir: str, title: str, refresh: int = 0):
        self.title = title
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.rows: List[str] = []
        self.refresh = refresh

    def get_image_dir(self) -> str:
        return self.img_dir

    def add_header(self, text: str):
        self.rows.append(f"<h3>{text}</h3>")

    def add_images(self, ims: List[str], txts: List[str], links: List[str], width=256):
        cells = []
        for im, txt, link in zip(ims, txts, links):
            cells.append(
                f'<td style="text-align:center"><a href="images/{link}">'
                f'<img src="images/{im}" width="{width}"></a><br>{txt}</td>'
            )
        self.rows.append(
            '<table style="border-collapse:collapse"><tr>' + "".join(cells) + "</tr></table>"
        )

    def save(self):
        refresh = (
            f'<meta http-equiv="refresh" content="{self.refresh}">' if self.refresh else ""
        )
        body = "\n".join(self.rows)
        doc = (
            f"<!DOCTYPE html><html><head><title>{self.title}</title>{refresh}"
            f"</head><body>{body}</body></html>"
        )
        with open(os.path.join(self.web_dir, "index.html"), "w") as f:
            f.write(doc)
