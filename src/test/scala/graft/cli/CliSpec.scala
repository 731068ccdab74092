package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** Flag-parsing contract for the CLI loaders: a typo'd or stray flag is
  * a hard error, never a silent fall-through to the default warehouse
  * directory (a load landing in ./warehouse when the operator asked for
  * /data/wh is a data-placement incident, not a default). */
class CliSpec extends AnyFunSuite {

  test("dirs: defaults when no flags given") {
    assert(Cli.dirs(Nil) == ("warehouse", "rejects"))
  }

  test("dirs: both flags parse in either order") {
    assert(Cli.dirs(Seq("--warehouse", "/w", "--rejects", "/r")) == ("/w", "/r"))
    assert(Cli.dirs(Seq("--rejects", "/r", "--warehouse", "/w")) == ("/w", "/r"))
  }

  test("dirs: unknown flag is a hard error, not a silent default") {
    val e = intercept[RuntimeException] {
      Cli.dirs(Seq("--warehose", "/x"))
    }
    assert(e.getMessage.contains("--warehose"))
  }

  test("dirs: known flag whose 'value' is itself a flag is a hard error") {
    // `--warehouse --rejects` (forgotten value, even argv) must not parse
    // as warehouse dir literally "--rejects" with rejects defaulting
    val e = intercept[RuntimeException] {
      Cli.dirs(Seq("--warehouse", "--rejects"))
    }
    assert(e.getMessage.contains("missing a value"))
    val e2 = intercept[RuntimeException] {
      Cli.dirs(Seq("--rejects", "--warehouse", "/w", "x"))
    }
    assert(e2.getMessage.contains("missing a value"))
  }

  test("dirs: stray trailing argument is a hard error") {
    val e = intercept[RuntimeException] {
      Cli.dirs(Seq("--warehouse", "/w", "oops"))
    }
    assert(e.getMessage.contains("oops"))
  }
}
