package graft

import org.scalatest.funsuite.AnyFunSuite

/** REGISTRY.md sync gate (round-6 verdict #8): the committed operator
  * index must be byte-identical to what `RegistryDoc.render()` generates
  * from `Registry.modules` — a new/renamed/re-oracled query without a
  * regenerated REGISTRY.md fails here, as does a new module without a
  * plan-shape one-liner or a bench-set name that no longer resolves. */
class RegistryDocSpec extends AnyFunSuite {

  test("every Registry module has a plan-shape one-liner") {
    val missing = Registry.modules.map(_._1).filterNot(RegistryDoc.moduleNotes.contains)
    assert(missing.isEmpty, s"moduleNotes missing: ${missing.mkString(", ")}")
    val stale = RegistryDoc.moduleNotes.keys.toSeq
      .filterNot(Registry.modules.map(_._1).contains)
    assert(stale.isEmpty, s"moduleNotes for unknown modules: ${stale.mkString(", ")}")
  }

  test("every bench-decade member resolves to a registered query") {
    val unknown = BenchSets.decadeOf.keys.filterNot(Registry.byName.contains)
    assert(unknown.isEmpty, s"decade names not in registry: ${unknown.mkString(", ")}")
  }

  test("committed REGISTRY.md is in sync with Registry.modules") {
    val path = java.nio.file.Paths.get("REGISTRY.md")
    assert(java.nio.file.Files.exists(path),
      "REGISTRY.md missing — run `runMain graft.RegistryDoc`")
    val onDisk = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    assert(onDisk === RegistryDoc.render(),
      "REGISTRY.md drifted — regenerate with `runMain graft.RegistryDoc`")
  }

  test("module attribution is total: modules flatten to exactly Registry.all") {
    assert(Registry.modules.flatMap(_._2).map(_.name) === Registry.all.map(_.name))
    val dup = Registry.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
  }
}
