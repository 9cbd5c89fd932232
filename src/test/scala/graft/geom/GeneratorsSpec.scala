package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors `/root/reference/tests/test_generators.py` invariants. */
class GeneratorsSpec extends AnyFunSuite {

  test("sphere points are unit-norm") {
    for (v <- Generators.sphereXyz(500, seed = 1))
      assert(math.abs(v.norm - 1.0) < 1e-12)
  }

  test("hemisphere folding bounds z sign") {
    assert(Generators.sphereXyz(500, hemi = 1, seed = 2).forall(_.z >= 0))
    assert(Generators.sphereXyz(500, hemi = -1, seed = 3).forall(_.z <= 0))
    val full = Generators.sphereXyz(500, hemi = 0, seed = 4)
    assert(full.exists(_.z > 0) && full.exists(_.z < 0))
  }

  test("seeded generation is reproducible") {
    assert(Generators.sphereXyz(100, seed = 42) ==
      Generators.sphereXyz(100, seed = 42))
    assert(Generators.sphereXyz(100, seed = 42) !=
      Generators.sphereXyz(100, seed = 43))
  }

  test("cone points stay within the cone; degenerate zero cone") {
    val axis = Vec3(1, 2, -1).normalized
    val open = math.toRadians(3.52)
    for (v <- Generators.coneXyz(axis, open, 500, seed = 5)) {
      assert(math.abs(v.norm - 1.0) < 1e-12)
      assert(axis.angleTo(v) <= open / 2 + 1e-9)
    }
    for (v <- Generators.coneXyz(axis, 0.0, 10, seed = 6))
      assert(axis.angleTo(v) < 1e-7)
  }

  test("poisson mean is approximately right") {
    val rng = new scala.util.Random(9)
    val n = 2000
    val mean = (1 to n).map(_ => Generators.poisson(5.0, rng)).sum.toDouble / n
    assert(math.abs(mean - 5.0) < 0.3)
  }
}
