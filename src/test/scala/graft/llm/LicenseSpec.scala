package graft.llm

import graft.SparkSpec

class LicenseSpec extends SparkSpec {

  test("SPDX tag wins over phrases; id case preserved; comment closers stripped") {
    assert(License.detect("// SPDX-License-Identifier: Apache-2.0\ncode") ==
      License.Detection("Apache-2.0", "spdx"))
    assert(License.detect("/* spdx-license-identifier: MIT */\nbody") ==
      License.Detection("MIT", "spdx"))
    assert(License.detect("<!-- SPDX-License-Identifier: BSD-2-Clause -->") ==
      License.Detection("BSD-2-Clause", "spdx"))
    // tag beats a conflicting phrase
    assert(License.detect(
      "# SPDX-License-Identifier: GPL-2.0\n" +
        "Permission is hereby granted, free of charge, ...").license == "GPL-2.0")
    // compound expressions come through verbatim
    assert(License.detect("// SPDX-License-Identifier: (MIT OR Apache-2.0)")
      .license == "(MIT OR Apache-2.0)")
  }

  test("phrase fingerprints: specificity ordering") {
    assert(License.detect(
      "Permission is hereby granted, free of\ncharge, to any person").license == "MIT")
    assert(License.detect(
      "Licensed under the Apache License,   Version 2.0 (the License)")
      .license == "Apache-2.0")
    val bsd = "Redistribution and use in source and binary forms, with or without"
    assert(License.detect(bsd + " ... Neither the name of X").license == "BSD-3-Clause")
    assert(License.detect(bsd).license == "BSD-2-Clause")
    assert(License.detect(
      "under the GNU General Public License as published; either version 3")
      .license == "GPL-3.0")
    assert(License.detect(
      "under the GNU General Public License as published; either version 2")
      .license == "GPL-2.0")
    assert(License.detect("This is free and unencumbered software released into")
      .license == "Unlicense")
    assert(License.detect("no license text here at all") ==
      License.Detection("NONE", "none"))
    assert(License.detect("") == License.Detection("NONE", "none"))
    assert(License.detect(null) == License.Detection("NONE", "none"))
  }

  test("only the head is scanned") {
    val far = ("x" * (License.HeadChars + 100)) +
      "\nSPDX-License-Identifier: MIT\n"
    assert(License.detect(far) == License.Detection("NONE", "none"))
    val near = "SPDX-License-Identifier: MIT\n" + ("x" * (License.HeadChars * 2))
    assert(License.detect(near).license == "MIT")
  }
}
