// Compiles the single-file native runtime straight into the crate — the
// same pattern the reference uses (its build.rs compiles the C core with
// `cc`, reference build.rs).  The source is vendored by path: point
// TAPECRAFT_SRC at stringzilla_tpu/native/tapecraft.cpp (or copy the two
// files next to this crate).
fn main() {
    let src = std::env::var("TAPECRAFT_SRC")
        .unwrap_or_else(|_| "../../stringzilla_tpu/native/tapecraft.cpp".into());
    println!("cargo:rerun-if-changed={src}");
    println!("cargo:rerun-if-env-changed=TAPECRAFT_SRC");
    cc::Build::new()
        .cpp(true)
        .file(&src)
        .flag_if_supported("-std=c++17")
        .flag_if_supported("-O3")
        .flag_if_supported("-march=native")
        .compile("tapecraft_native");
}
