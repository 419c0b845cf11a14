// C++ host driving code generation through the C-ABI tiny_codegen shim —
// argument-for-argument the reference's codegen example (reference:
// examples/codegen_cartpole.cpp:9-69 data and call; codegen.hpp:10-15
// signature). Proves a native host needs no Python of its own to generate a
// deployment project from this framework.
//
// Build + run (tests/test_codegen.py::test_c_callable_codegen drives this):
//   g++ -O2 -std=c++17 native/examples/codegen_cartpole_host.cpp \
//       native/src/tiny_codegen_c.cpp -o codegen_cartpole_host
//   ./codegen_cartpole_host <tinympc_dir> <output_dir>

#include <cstdio>

typedef double tinytype;

extern "C" int tiny_codegen(int nx, int nu, int N,
                            tinytype* Adyn, tinytype* Bdyn,
                            tinytype* Q, tinytype* R,
                            tinytype* x_min, tinytype* x_max,
                            tinytype* u_min, tinytype* u_max,
                            tinytype rho, tinytype abs_pri_tol,
                            tinytype abs_dua_tol,
                            int max_iters, int check_termination,
                            int gen_wrapper,
                            const char* tinympc_dir, const char* output_dir);

extern "C"
{
    // Model size (reference: examples/codegen_cartpole.cpp:17-19)
    const int n = 4;  // state: x (m), theta (rad), dx, dtheta
    const int m = 1;  // input: F (Newtons)
    const int N = 10; // horizon

    // Upright-cartpole LTI, col-major as Eigen expects
    // (reference: examples/codegen_cartpole.cpp:21-27).
    tinytype Adyn_data[n * n] = {
        1.0, 0.0, 0.0, 0.0,
        0.01, 1.0, 0.0, 0.0,
        2.2330083403300767e-5, 0.004466210576510177,
        1.0002605176397052, 0.05210579005928538,
        7.443037974683548e-8, 2.2330083403300767e-5,
        0.01000086835443038, 1.0002605176397052};
    tinytype Bdyn_data[n * m] = {
        7.468368562730335e-5, 0.014936765390161838,
        3.79763323185387e-5, 0.007595596218554721};
    tinytype Q_data[n] = {10, 1, 10, 1};
    tinytype R_data[m] = {1};
    tinytype rho_value = 0.1;

    tinytype x_min_data[n * N];
    tinytype x_max_data[n * N];
    tinytype u_min_data[m * (N - 1)];
    tinytype u_max_data[m * (N - 1)];

    tinytype abs_pri_tol = 1e-3;
    tinytype abs_dual_tol = 1e-3;
    int max_iter = 100;
    int check_termination = 1;
    int gen_wrapper = 1;

    int main(int argc, char** argv)
    {
        if (argc < 3) {
            std::fprintf(stderr,
                         "usage: codegen_cartpole_host <tinympc_dir> "
                         "<output_dir>\n");
            return 2;
        }

        // Bounds filled in a loop, +-5 everywhere
        // (reference: examples/codegen_cartpole.cpp:50-60).
        for (int i = 0; i < n * N; i++) {
            x_min_data[i] = -5;
            x_max_data[i] = 5;
        }
        for (int i = 0; i < m * (N - 1); i++) {
            u_min_data[i] = -5;
            u_max_data[i] = 5;
        }

        int rc = tiny_codegen(n, m, N, Adyn_data, Bdyn_data, Q_data, R_data,
                              x_min_data, x_max_data, u_min_data, u_max_data,
                              rho_value, abs_pri_tol, abs_dual_tol, max_iter,
                              check_termination, gen_wrapper,
                              argv[1], argv[2]);
        std::printf(rc == 0 ? "HOORAY\n" : "OOPS rc=%d\n", rc);
        return rc;
    }
}
