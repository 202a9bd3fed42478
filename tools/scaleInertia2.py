#!/usr/bin/env python
"""Scale all masses and inertias of a URDF IN PLACE in the XML —
comments and unrelated markup preserved (counterpart of the
reference's tools/scaleInertia2.py, which edits the ElementTree with a
comment-preserving parser instead of regenerating the file like
scaleInertia.py does)."""

from __future__ import annotations

import argparse
import sys
import xml.etree.ElementTree as ET


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="URDF to load")
    p.add_argument("--output", required=True, help="where to write the scaled URDF")
    p.add_argument("--scale", required=True, type=float)
    args = p.parse_args()

    class PCBuilder(ET.TreeBuilder):
        """Keep XML comments through the round trip (comments outside
        the root element would be 'multiple elements on top level' —
        they are dropped)."""

        def __init__(self):
            super().__init__()
            self._depth = 0

        def start(self, tag, attrs):
            self._depth += 1
            return super().start(tag, attrs)

        def end(self, tag):
            self._depth -= 1
            return super().end(tag)

        def comment(self, data):
            if self._depth > 0:
                super().start(ET.Comment, {})
                super().data(data)
                super().end(ET.Comment)

    tree = ET.parse(args.model, parser=ET.XMLParser(target=PCBuilder()))
    n = 0
    for link in tree.findall("link"):
        mass_el = link.find("inertial/mass")
        if mass_el is None:
            continue
        mass = float(mass_el.attrib.get("value", 0.0))
        mass_el.attrib["value"] = repr(mass * args.scale)
        inert = link.find("inertial/inertia")
        if inert is not None:
            for k in ("ixx", "ixy", "ixz", "iyy", "iyz", "izz"):
                if k in inert.attrib:
                    inert.attrib[k] = repr(float(inert.attrib[k]) * args.scale)
        n += 1
        print(f"scaled link {link.attrib.get('name')}: mass {mass} -> {mass * args.scale}")
    tree.write(args.output, xml_declaration=True)
    print(f"wrote {args.output} ({n} links scaled by {args.scale})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
